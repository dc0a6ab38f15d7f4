"""WAV PCM codec (pdfcore/wav.py): roundtrip, independent stdlib-wave
oracle, chunk walking, and malformed-input fuzz."""

import io
import struct
import wave

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.pdfcore.wav import (
    WavError,
    decode_wav,
    decode_wav_samples,
    encode_wav,
)


def test_roundtrip_mono16():
    vals = [0, 1, -1, 32767, -32768, 123, -456]
    wav = encode_wav(vals + [0], 1, 8000)  # even count for clean frames
    rate, ch, width, got = decode_wav_samples(wav)
    assert (rate, ch, width) == (8000, 1, 2)
    assert got == vals + [0]


def test_roundtrip_stereo_and_8bit():
    vals = [10, 20, 30, 40]
    rate, ch, width, got = decode_wav_samples(encode_wav(vals, 2, 44100))
    assert (rate, ch, width, got) == (44100, 2, 2, vals)
    rate, ch, width, got = decode_wav_samples(
        encode_wav([0, 127, 255], 1, 16000, sampwidth=1)
    )
    assert (rate, ch, width, got) == (16000, 1, 1, [0, 127, 255])


def test_stdlib_wave_is_an_independent_oracle():
    """Our encoder's bytes must parse identically in stdlib wave, and
    our decoder must parse stdlib wave's bytes identically."""
    vals = [(i * 313 % 65536) - 32768 for i in range(64)]
    ours = encode_wav(vals, 2, 22050)
    with wave.open(io.BytesIO(ours)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
            22050, 2, 2,
        )
        frames = w.readframes(w.getnframes())
    assert frames == struct.pack("<64h", *vals)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(11025)
        w.writeframes(struct.pack("<64h", *vals))
    rate, ch, width, got = decode_wav_samples(buf.getvalue())
    assert (rate, ch, width, got) == (11025, 1, 2, vals)


def test_decoder_walks_unknown_chunks():
    """A LIST chunk between fmt and data must be skipped, including the
    odd-size padding byte."""
    base = encode_wav([5, -5], 1, 8000)
    fmt_at = base.index(b"fmt ")
    data_at = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = base[:data_at] + extra + base[data_at:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert fmt_at < data_at
    rate, ch, width, got = decode_wav_samples(patched)
    assert got == [5, -5]


def test_malformed_inputs_raise_waverror():
    good = encode_wav([1, 2, 3, 4], 2, 8000)
    for bad in (
        b"",
        b"RIFF",
        b"RIFX" + good[4:],
        good[:8] + b"AIFF" + good[12:],
        good[:20],  # truncated fmt
        good[:-3],  # truncated data chunk
    ):
        with pytest.raises(WavError):
            decode_wav(bad)
    # non-PCM format tag
    tagged = bytearray(good)
    tagged[good.index(b"fmt ") + 8] = 3  # IEEE float tag
    with pytest.raises(WavError):
        decode_wav(bytes(tagged))


def test_encoder_rejects_bad_shapes():
    with pytest.raises(WavError):
        encode_wav([1, 2, 3], 2, 8000)  # not a multiple of channels
    with pytest.raises(WavError):
        encode_wav([1], 1, 8000, sampwidth=3)
    with pytest.raises(WavError):
        encode_wav([], 0, 8000)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(-32768, 32767), max_size=40),
    ch=st.integers(1, 3),
    rate=st.integers(1, 192000),
    cut=st.integers(0, 60),
)
def test_fuzz_roundtrip_and_truncation(vals, ch, rate, cut):
    vals = vals[: len(vals) - len(vals) % ch]
    wav = encode_wav(vals, ch, rate)
    assert decode_wav_samples(wav)[3] == vals
    truncated = wav[: len(wav) - cut]
    try:
        decode_wav(truncated)
    except WavError:
        pass  # must raise WavError or succeed, never anything else
