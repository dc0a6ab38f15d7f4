"""Minimal PNG codec (spec-derived: RFC 2083 / W3C PNG), pure Python.

Closes the multimodal decode gap for ``image/png`` payloads: no image
libraries exist in this container, so the engine carries its own
codec, exactly like the JPEG path (``pdfcore/jpeg.py``). Scope is the
training-data-pipeline need — 8-bit greyscale (color type 0) and RGB
(color type 2), non-interlaced, all five row filters on decode (the
filter machinery is shared with the PDF FlateDecode Predictor-15 path
in ``filters.py``); the encoder writes filter-0 rows.
"""

from __future__ import annotations

import struct
import zlib

from .filters import FilterError, apply_png_predictor

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class PngError(Exception):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """RGB (channels=3) or greyscale (channels=1) 8-bit PNG with
    filter-0 rows; deterministic for fixed zlib level."""
    if channels not in (1, 3):
        raise PngError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise PngError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    color_type = 2 if channels == 3 else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, channels, pixel bytes). Raises PngError on
    anything outside the supported profile or on corrupt data."""
    if not data.startswith(_SIGNATURE):
        raise PngError("bad signature")
    pos = len(_SIGNATURE)
    width = height = channels = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngError(f"bad crc in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color == 2:
                channels = 3
            elif color == 0:
                channels = 1
            else:
                raise PngError(f"unsupported color type {color}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise PngError("unsupported compression/filter/interlace")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR or IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngError(f"corrupt IDAT: {e}") from e
    expected = height * (1 + width * channels)
    if len(raw) != expected:
        raise PngError(f"decompressed size {len(raw)} != {expected}")
    try:
        # per-row filter undo shared with the PDF Predictor>=10 path
        pixels = apply_png_predictor(raw, colors=channels, bpc=8, columns=width)
    except FilterError as e:
        raise PngError(str(e)) from e
    return width, height, channels, pixels
