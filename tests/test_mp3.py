"""MPEG audio metadata codec (pdfcore/mp3.py): roundtrips, tag
handling, strict-walk error paths, and hypothesis fuzz.

The codec is metadata-only (frame-header walk, ISO 11172-3 layout) —
the closed-enum media-type extension of the reference's filter set
(reference src/image.rs:32-40)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.pdfcore.mp3 import (
    BITRATES_KBPS,
    SAMPLE_RATES,
    Mp3Error,
    decode_mp3_meta,
    encode_mp3,
)

RATES = (44100, 48000, 32000)
BRS = tuple(b for b in BITRATES_KBPS if b)


def test_roundtrip_matrix():
    for rate in RATES:
        for br in (32, 128, 320):
            for ch in (1, 2):
                for nf in (1, 2, 17):
                    m = encode_mp3(nf, br, rate, ch, seed=nf)
                    meta = decode_mp3_meta(m)
                    base = 144 * br * 1000 // rate
                    assert meta == {
                        "version": "1",
                        "layer": 3,
                        "sample_rate": rate,
                        "channels": ch,
                        "bitrate_kbps": br,
                        "n_frames": nf,
                        "duration_ms": nf * 1152 * 1000 // rate,
                        "stream_bytes": nf * base + nf // 2,
                    }


def test_id3v2_tag_skipped_and_id3v1_trailer_ignored():
    m = encode_mp3(5, 128, 44100, 2, id3_payload=b"TIT2junkpayload")
    assert m[:3] == b"ID3"
    assert decode_mp3_meta(m)["n_frames"] == 5
    assert decode_mp3_meta(m + b"TAG" + bytes(125))["n_frames"] == 5


def test_id3v2_footer_flag():
    m = encode_mp3(3, 96, 32000, 1)
    # set the footer flag and append the 10-byte footer after the tag
    b = bytearray(m)
    b[5] |= 0x10
    b2 = bytes(b[:10]) + b"3DI" + bytes(7) + bytes(b[10:])
    assert decode_mp3_meta(b2)["n_frames"] == 3


def test_strict_walk_errors():
    m = encode_mp3(4, 128, 44100, 2)
    with pytest.raises(Mp3Error, match="truncated frame"):
        decode_mp3_meta(m[:-1])
    with pytest.raises(Mp3Error, match="no MPEG frames"):
        decode_mp3_meta(b"ID3" + bytes((3, 0, 0)) + bytes(4))
    with pytest.raises(Mp3Error, match="frame sync"):
        decode_mp3_meta(bytes(16))
    # flip the FIRST frame's version bits to MPEG-2: it then claims a
    # different sample rate + frame length, so the walk desyncs on the
    # (still MPEG-1) second frame — strictness now comes from the
    # exact length arithmetic, not a version whitelist
    b = bytearray(m)
    start = 10  # empty ID3v2 tag
    b[start + 1] &= ~0x08
    with pytest.raises(Mp3Error, match="frame sync|inconsistent|truncated"):
        decode_mp3_meta(bytes(b))
    # inconsistent stream: second frame with a different bitrate
    m2 = encode_mp3(1, 128, 44100, 2)
    m3 = encode_mp3(1, 192, 44100, 2)
    with pytest.raises(Mp3Error, match="inconsistent"):
        decode_mp3_meta(m2 + m3[10:])
    # ID3v2 size exceeding payload
    with pytest.raises(Mp3Error, match="exceeds"):
        decode_mp3_meta(b"ID3" + bytes((3, 0, 0)) + b"\x00\x00\x01\x00")
    # non-syncsafe size byte
    with pytest.raises(Mp3Error, match="syncsafe"):
        decode_mp3_meta(b"ID3" + bytes((3, 0, 0)) + b"\x80\x00\x00\x00")


def test_encoder_rejects_bad_params():
    with pytest.raises(Mp3Error):
        encode_mp3(1, 127, 44100, 2)  # not a table bitrate
    with pytest.raises(Mp3Error):
        encode_mp3(1, 128, 22050, 2)  # MPEG-2 rate
    with pytest.raises(Mp3Error):
        encode_mp3(1, 128, 44100, 3)
    with pytest.raises(Mp3Error):
        encode_mp3(0, 128, 44100, 1)


@settings(max_examples=150, deadline=None)
@given(
    nf=st.integers(1, 24),
    br=st.sampled_from(BRS),
    rate=st.sampled_from(RATES),
    ch=st.sampled_from((1, 2)),
    seed=st.integers(0, 1 << 20),
    cut=st.integers(0, 4000),
    flip=st.integers(0, 1 << 16),
)
def test_fuzz_roundtrip_truncation_corruption(nf, br, rate, ch, seed, cut, flip):
    m = encode_mp3(nf, br, rate, ch, seed=seed)
    meta = decode_mp3_meta(m)
    assert meta["n_frames"] == nf and meta["bitrate_kbps"] == br
    # any truncation either decodes (a frame-aligned prefix) or raises
    # the codec's own error, never a foreign exception
    try:
        got = decode_mp3_meta(m[: cut % len(m)])
        assert got["n_frames"] <= nf
    except Mp3Error:
        pass
    b = bytearray(m)
    b[flip % len(b)] ^= 1 << (flip % 8 or 1)
    try:
        decode_mp3_meta(bytes(b))
    except Mp3Error:
        pass


def test_decode_stub_mpeg_arm_is_real():
    from pdf_parser_ray.pipelines.multimodal import decode_stub

    m = encode_mp3(7, 160, 48000, 1)
    meta = decode_stub(m, "audio/mpeg")
    assert meta["width"] == 7 and meta["height"] == 1
    with pytest.raises(NotImplementedError, match="mp3 decode failed"):
        decode_stub(b"ID3" + bytes(16), "audio/mpeg")


def test_version_layer_matrix_roundtrip():
    """MPEG-1/2/2.5 x Layer I/II/III: header walk recovers everything,
    frame-length arithmetic exact (truncation of the last byte raises)."""
    from pdf_parser_ray.pdfcore.mp3 import (
        SAMPLE_RATES_BY_VERSION,
        _bitrate_table,
        samples_per_frame,
    )

    for ver in ("1", "2", "2.5"):
        for lay in (1, 2, 3):
            tbl = _bitrate_table(ver, lay)
            for br in (tbl[1], tbl[14]):
                for sr in SAMPLE_RATES_BY_VERSION[ver][:3]:
                    m = encode_mp3(3, br, sr, 2, seed=7, version=ver, layer=lay)
                    meta = decode_mp3_meta(m)
                    assert (meta["version"], meta["layer"]) == (ver, lay)
                    assert (meta["sample_rate"], meta["bitrate_kbps"]) == (sr, br)
                    assert meta["n_frames"] == 3
                    assert meta["duration_ms"] == (
                        3 * samples_per_frame(ver, lay) * 1000 // sr
                    )
                    with pytest.raises(Mp3Error):
                        decode_mp3_meta(m[:-1])


def test_layer1_padding_is_one_slot():
    """Layer I padding adds a 4-byte SLOT, not one byte (ISO 11172-3
    §2.4.3.1) — pad_odd frames must be exactly 4 bytes longer."""
    from pdf_parser_ray.pdfcore.mp3 import _frame_len

    assert _frame_len("1", 1, 128, 44100, 1) - _frame_len("1", 1, 128, 44100, 0) == 4
    assert _frame_len("1", 3, 128, 44100, 1) - _frame_len("1", 3, 128, 44100, 0) == 1
    # MPEG-2 Layer III frames are half the MPEG-1 size
    assert _frame_len("2", 3, 64, 22050, 0) == 72 * 64000 // 22050
