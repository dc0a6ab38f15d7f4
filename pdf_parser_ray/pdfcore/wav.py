"""Minimal RIFF/WAVE integer-PCM codec, spec-derived (RIFF container
chunks per the public WAVE format description: ``RIFF``/``WAVE`` header,
``fmt `` chunk with PCM format tag 1, ``data`` chunk, chunks padded to
even sizes). No audio library exists in this container, so this is the
engine's own codec, same as pdfcore/{jpeg,png,gif}.py; the stdlib
``wave`` module is used ONLY as an independent oracle in tests.

Supports 8-bit unsigned and 16-bit signed little-endian PCM, mono or
interleaved multichannel. The decoder walks unknown chunks (e.g.
``LIST``/``INFO``) instead of assuming a fixed 44-byte layout.
"""

from __future__ import annotations

import struct
import sys

__all__ = ["WavError", "encode_wav", "decode_wav", "decode_wav_samples"]


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def encode_wav(
    samples, n_channels: int, sample_rate: int, sampwidth: int = 2
) -> bytes:
    """Interleaved integer samples -> RIFF/WAVE PCM bytes.

    ``samples``: iterable of ints — signed [-32768, 32767] for
    sampwidth=2, unsigned [0, 255] for sampwidth=1. Length must be a
    multiple of ``n_channels``.
    """
    if sampwidth not in (1, 2):
        raise WavError(f"unsupported sample width {sampwidth}")
    if n_channels < 1:
        raise WavError("n_channels must be >= 1")
    samples = list(samples)
    if len(samples) % n_channels:
        raise WavError("sample count not a multiple of n_channels")
    if sampwidth == 2:
        data = struct.pack("<%dh" % len(samples), *samples)
    else:
        data = bytes(samples)
    byte_rate = sample_rate * n_channels * sampwidth
    block_align = n_channels * sampwidth
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align,
        sampwidth * 8,
    )
    chunks = b"".join(
        (
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
            b"\x00" if len(data) % 2 else b"",
        )
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM bytes -> (sample_rate, n_channels, sampwidth,
    frame_bytes). Raises :class:`WavError` on anything malformed."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise WavError("not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise WavError("RIFF form is not WAVE")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt_chunk = data_chunk = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
        pos += 8 + size + (size & 1)  # chunks are padded to even sizes
    if fmt_chunk is None or len(fmt_chunk) < 16:
        raise WavError("missing fmt chunk")
    if data_chunk is None:
        raise WavError("missing data chunk")
    tag, n_channels, sample_rate, _rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt_chunk[:16]
    )
    if tag != 1:
        raise WavError(f"unsupported format tag {tag} (PCM only)")
    if bits not in (8, 16):
        raise WavError(f"unsupported bit depth {bits}")
    if n_channels < 1:
        raise WavError("zero channels")
    sampwidth = bits // 8
    if block_align != n_channels * sampwidth:
        raise WavError("block_align inconsistent with fmt")
    usable = len(data_chunk) - len(data_chunk) % block_align
    return sample_rate, n_channels, sampwidth, data_chunk[:usable]


def decode_wav_samples(payload: bytes):
    """RIFF/WAVE PCM bytes -> (sample_rate, n_channels, sampwidth,
    interleaved int samples) — 16-bit signed or 8-bit unsigned."""
    import array

    sample_rate, n_channels, sampwidth, frames = decode_wav(payload)
    if sampwidth == 2:
        a = array.array("h", frames)
        if sys.byteorder == "big":
            a.byteswap()
        vals = a.tolist()
    else:
        vals = list(frames)
    return sample_rate, n_channels, sampwidth, vals
