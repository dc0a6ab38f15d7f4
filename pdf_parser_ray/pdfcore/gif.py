"""Minimal GIF codec (spec-derived: GIF89a specification), pure Python.

Closes the multimodal decode gap for ``image/gif`` payloads. Scope:
single- and multi-image GIFs with a global (or local) color table,
interlaced or not; sub-rectangle frames composite onto a logical-
screen canvas (replace semantics — GCE disposal methods are ignored,
which matches disposal 0/1; frames that rely on disposal 2/3 will
show stale pixels). Extensions are otherwise skipped. Compositing
assumes frames share one effective color table (true for every GIF
this engine synthesizes and the overwhelmingly common case); a later
frame's local table simply becomes the reported palette. GIF's LZW is
a DIFFERENT dialect from the PDF LZWDecode in ``filters.py`` —
variable code width packed LSB-first with in-stream Clear/End codes —
so it lives here.
"""

from __future__ import annotations

import struct


class GifError(Exception):
    pass


# canvas allocation cap (pixels): far above any synthesized or sane
# web GIF, far below a corrupt-header 65535x65535 = 4 GB allocation
MAX_CANVAS_PIXELS = 1 << 26


def _lzw_encode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-dialect LZW: codes packed LSB-first, Clear emitted up front
    and whenever the table fills (4096).

    Code-width bookkeeping MIRRORS THE DECODER exactly: the decoder
    appends one table entry after every normal code except the first
    since a Clear, and widens when ITS table size reaches 2^width —
    which lags the encoder's own table by one entry. Tracking the
    decoder's size (``dec_size``) instead of the encoder's
    ``next_code`` keeps both sides bit-synchronized at every width
    boundary (an off-by-one here desyncs at the SECOND boundary —
    caught by hypothesis at min_code_size=2)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = eoi + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = base
    dec_size = base  # the decoder's table size, tracked exactly
    first_since_clear = True
    emit(clear)

    def after_emit():
        # the decoder appends after every normal code except the first
        # since a Clear; its append may widen the NEXT code
        nonlocal dec_size, first_since_clear, width
        if first_since_clear:
            first_since_clear = False
            return
        dec_size += 1
        if dec_size == (1 << width) and width < 12:
            width += 1

    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        after_emit()
        table[nxt] = next_code
        next_code += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = base
            dec_size = base
            width = min_code_size + 1
            first_since_clear = True
        cur = bytes([byte])
    if cur:
        emit(table[cur])
        after_emit()
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int, max_out: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise GifError(f"bad first code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                # deferred-clear support: a spec encoder may keep
                # emitting 12-bit codes after the table fills; the
                # decoder must STOP adding entries at 4096 until a
                # Clear arrives or both sides desync
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise GifError(f"code {code} beyond table {len(table)}")
            out += entry
            if len(out) > max_out:
                raise GifError("pixel output exceeds image size")
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    raise GifError("missing end-of-information code")


def _blocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_order(height: int) -> list[int]:
    """GIF89a four-pass interlace row order: the n-th row of the
    stored data lands on canvas row ``order[n]``."""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def _deinterlace(indices: bytes, width: int, height: int) -> bytes:
    out = bytearray(len(indices))
    for n, dst in enumerate(_interlace_order(height)):
        out[dst * width : (dst + 1) * width] = indices[
            n * width : (n + 1) * width
        ]
    return bytes(out)


def encode_gif(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a with a 256-entry global color table.
    ``indices`` are palette indices (one byte per pixel, row-major);
    ``palette`` is 768 bytes of RGB triples. ``interlace`` stores the
    rows in the spec's four-pass order with the interlace flag set."""
    if len(palette) != 768:
        raise GifError("palette must be 256 RGB entries (768 bytes)")
    if len(indices) != width * height:
        raise GifError(f"index buffer {len(indices)} != {width}x{height}")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT flag, 8-bit color, GCT size 256
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += palette
    # image descriptor, no local color table
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    if interlace:
        indices = b"".join(
            indices[r * width : (r + 1) * width]
            for r in _interlace_order(height)
        )
    out.append(8)  # LZW minimum code size
    out += _blocks(_lzw_encode_gif(indices, 8))
    out += b"\x3b"
    return bytes(out)


def encode_gif_animation(
    frames: list[bytes],
    width: int,
    height: int,
    palette: bytes,
    delay_cs: int = 4,
) -> bytes:
    """Animated GIF89a: global color table, NETSCAPE2.0 loop-forever
    application extension, and per frame a Graphic Control Extension
    (delay, no disposal/transparency) + image descriptor + LZW data.
    Every frame is full-size ``width x height`` palette indices."""
    if len(palette) != 768:
        raise GifError("palette must be 256 RGB entries (768 bytes)")
    if not frames:
        raise GifError("animation needs at least one frame")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += palette
    # application extension: loop count 0 = forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for indices in frames:
        if len(indices) != width * height:
            raise GifError(f"frame {len(indices)} != {width}x{height}")
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)
        out += _blocks(_lzw_encode_gif(indices, 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes, bytes]:
    """-> (width, height, palette(768 or local size*3), index bytes)
    of the logical-screen canvas after the FIRST image block. Raises
    GifError on corrupt/unsupported data."""
    w, h, palette, frames = decode_gif_frames(data, max_frames=1)
    return w, h, palette, frames[0]


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, bytes, list[bytes]]:
    """-> (screen_width, screen_height, palette, [frame index bytes,
    ...]) for ALL image blocks (or the first ``max_frames``). Every
    frame is a full logical-screen canvas snapshot: sub-rectangle
    frames (valid and common in GIF89a animations) composite onto the
    previous canvas at their (left, top) offset with replace
    semantics; the initial canvas is the background color index (0
    without a global table). Interlaced image data is de-interlaced.
    A local color table overrides the global one in the returned
    palette. Raises GifError on corrupt/unsupported data."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad signature")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = b""
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        palette = data[pos : pos + size]
        if len(palette) != size:
            raise GifError("truncated global color table")
        pos += size
    if sw * sh > MAX_CANVAS_PIXELS:
        # decoder-side allocation guard: a corrupt 2-byte screen
        # descriptor must not make us allocate a 4 GB canvas
        raise GifError(f"logical screen {sw}x{sh} exceeds decoder cap")
    canvas = bytearray([bg if flags & 0x80 else 0]) * (sw * sh)
    frames: list[bytes] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        lx, ty, width, height, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if lx + width > sw or ty + height > sh:
            raise GifError(
                f"frame rect {width}x{height}+{lx}+{ty} exceeds "
                f"logical screen {sw}x{sh}"
            )
        if iflags & 0x80:  # local color table wins
            size = 3 * (2 << (iflags & 0x07))
            palette = data[pos : pos + size]
            if len(palette) != size:
                raise GifError("truncated local color table")
            pos += size
        if pos >= len(data):
            raise GifError("missing LZW code size")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise GifError(f"bad LZW min code size {min_code_size}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            chunk = data[pos + 1 : pos + 1 + n]
            if len(chunk) != n:
                raise GifError("truncated image sub-block")
            lzw += chunk
            pos += 1 + n
        if pos >= len(data):
            raise GifError("missing sub-block terminator")
        pos += 1
        if not palette:
            raise GifError("no color table")
        indices = _lzw_decode_gif(bytes(lzw), min_code_size, width * height)
        if len(indices) != width * height:
            raise GifError(
                f"decoded {len(indices)} pixels for {width}x{height}"
            )
        if iflags & 0x40:
            indices = _deinterlace(indices, width, height)
        for r in range(height):
            dst = (ty + r) * sw + lx
            canvas[dst : dst + width] = indices[r * width : (r + 1) * width]
        frames.append(bytes(canvas))
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, palette, frames
    if not frames:
        raise GifError("no image block")
    return sw, sh, palette, frames
