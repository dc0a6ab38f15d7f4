"""Stream filters (SURVEY.md §2.2 V16).

The reference supports FlateDecode (whole-buffer zlib inflate,
src/image.rs:134-139) and DCTDecode (JPEG, src/image.rs:140-143).
LZWDecode is absent from the reference but named by BASELINE.json's
north_star, so it is implemented fresh from the public PDF 1.7 spec
(§3.3.3): variable-width codes 9->12 bits, clear code 256, EOD 257,
EarlyChange=1 by default.

Safety addition over the reference (which inflates unboundedly): a
decompression output cap guards against zip bombs so one hostile
document cannot OOM a worker (SURVEY.md §4).
"""

from __future__ import annotations

import zlib

from .errors import FilterError

# 256 MiB decompressed cap per stream: far above any sane content
# stream, far below a worker heap. One hostile row must not OOM a task.
MAX_DECODED_BYTES = 256 * 1024 * 1024


def flate_decode(data: bytes, max_bytes: int = MAX_DECODED_BYTES) -> bytes:
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, max_bytes)
    except zlib.error as e:
        raise FilterError(f"FlateDecode failed: {e}") from e
    if len(out) >= max_bytes:
        raise FilterError("FlateDecode output exceeds safety cap")
    if not d.eof:
        # truncated deflate stream: the reference's whole-buffer inflate
        # errors here too — silent partial text must not pass as ok
        raise FilterError("FlateDecode stream truncated (no final block)")
    return out


def lzw_decode(
    data: bytes, early_change: int = 1, max_bytes: int = MAX_DECODED_BYTES
) -> bytes:
    """PDF LZWDecode (spec §3.3.3). Codes start at 9 bits; the table
    grows to 4096 entries; width bumps happen one code early when
    ``early_change`` is 1 (the spec default)."""
    CLEAR, EOD = 256, 257
    out = bytearray()
    base_table = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base_table)
    append = table.append
    prev: bytes | None = None
    width = 9
    limit = 1 << 9
    acc = 0
    nbits = 0
    # bit reader windowed per code-width run: the accumulator tops up
    # from the byte stream only when short (python loop per CODE, C
    # arithmetic per byte; O(n) regardless of stream size)
    total_bits = len(data) * 8
    pos = 0          # absolute bit position
    byte_pos = 0     # bytes consumed into acc
    while pos + width <= total_bits:
        while nbits < width:
            acc = (acc << 8) | data[byte_pos]
            byte_pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & (limit - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        pos += width
        if code == CLEAR:
            del table[258:]
            prev = None
            width = 9
            limit = 512
            continue
        if code == EOD:
            return bytes(out)
        n = len(table)
        if code < n:
            entry = table[code]
        elif code == n and prev is not None:
            entry = prev + prev[:1]
        else:
            raise FilterError(f"LZWDecode: invalid code {code}")
        out += entry
        if len(out) > max_bytes:
            raise FilterError("LZWDecode output exceeds safety cap")
        if prev is not None:
            append(prev + entry[:1])
        prev = entry
        if len(table) + early_change >= limit and width < 12:
            width += 1
            limit = 1 << width
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Encoder counterpart (used only to build test fixtures)."""
    CLEAR, EOD = 256, 257
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((EOD, width))
    acc = nbits = 0
    out = bytearray()
    for code, wdt in out_bits:
        acc = (acc << wdt) | code
        nbits += wdt
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Undo PNG row predictors (RFC 2083 §6; PDF 1.7 Table 3.8,
    Predictor >= 10). Used chiefly by cross-reference streams, which are
    almost always Flate + Predictor 12 (Up) in real files.

    Row layout: 1 tag byte + columns*colors*bpc/8 data bytes.
    """
    bpp = max(1, (colors * bpc) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    n = len(data)
    while pos < n:
        tag = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise FilterError(f"unsupported PNG predictor row tag {tag}")
        out += row
        prev = row
    return bytes(out)


def apply_predictor(data: bytes, parm: dict) -> bytes:
    """Dispatch /DecodeParms Predictor after a Flate/LZW decode."""
    predictor = int(parm.get("Predictor", 1))
    if predictor <= 1:
        return data
    colors = int(parm.get("Colors", 1))
    bpc = int(parm.get("BitsPerComponent", 8))
    columns = int(parm.get("Columns", 1))
    if predictor >= 10:
        return apply_png_predictor(data, colors, bpc, columns)
    if predictor == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise FilterError("TIFF predictor requires 8-bit components")
        row_len = columns * colors
        out = bytearray(data)
        for r in range(0, len(out), row_len):
            for i in range(r + colors, min(r + row_len, len(out))):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    raise FilterError(f"unsupported predictor {predictor}")


def png_predict_up(data: bytes, columns: int) -> bytes:
    """Encoder counterpart (Predictor 12/Up; used to build fixtures)."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def dct_decode(data: bytes) -> bytes:
    """DCTDecode (JPEG): returns dense row-major samples (RGB triplets
    or gray bytes). The reference decodes JPEG via the
    ``jpeg_decoder`` crate (src/image.rs:140-143); this container has
    no codec, so the engine carries its own pure-Python baseline
    implementation (pdfcore/jpeg.py)."""
    from .jpeg import JpegError, decode_jpeg

    try:
        return decode_jpeg(data)[3]
    except JpegError as e:
        raise FilterError(f"DCTDecode failed: {e}") from e


def ascii_hex_decode(data: bytes, max_bytes: int = MAX_DECODED_BYTES) -> bytes:
    """ASCIIHexDecode (PDF spec §7.4.2): pairs of hex digits, all PDF
    whitespace ignored, ``>`` is EOD; an odd trailing digit is padded
    with ``0``. Absent from the reference's closed filter enum
    (src/image.rs:126-130) — engine extension for full-spec parity."""
    out = bytearray()
    hi = -1
    for b in data:
        if b in b"\x00\t\n\x0c\r ":
            continue
        if b == 0x3E:  # '>' EOD
            break
        if 0x30 <= b <= 0x39:
            v = b - 0x30
        elif 0x41 <= b <= 0x46:
            v = b - 0x41 + 10
        elif 0x61 <= b <= 0x66:
            v = b - 0x61 + 10
        else:
            raise FilterError(f"ASCIIHexDecode: invalid character {b:#04x}")
        if hi < 0:
            hi = v
        else:
            out.append((hi << 4) | v)
            hi = -1
        if len(out) > max_bytes:
            raise FilterError("ASCIIHexDecode output exceeds safety cap")
    if hi >= 0:  # odd digit count: pad with 0
        out.append(hi << 4)
    return bytes(out)


def ascii_hex_encode(data: bytes) -> bytes:
    return data.hex().upper().encode("ascii") + b">"


def ascii85_decode(data: bytes, max_bytes: int = MAX_DECODED_BYTES) -> bytes:
    """ASCII85Decode (PDF spec §7.4.3): base-85 groups of 5 chars for
    4 bytes, ``z`` shorthand for an all-zero group, ``~>`` is EOD, PDF
    whitespace ignored. A final partial group of n chars (2 <= n <= 4)
    is padded with ``u`` and yields n-1 bytes."""
    out = bytearray()
    group: list[int] = []

    def flush(g: list[int], n_out: int) -> None:
        acc = 0
        for c in g:
            acc = acc * 85 + c
        if acc > 0xFFFFFFFF:
            raise FilterError("ASCII85Decode: group value overflow")
        out.extend(acc.to_bytes(4, "big")[:n_out])

    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b in b"\x00\t\n\x0c\r ":
            continue
        if b == 0x7E:  # '~' — must start the '~>' EOD (whitespace may
            # intervene: the spec lets whitespace occur anywhere)
            while i < n and data[i] in b"\x00\t\n\x0c\r ":
                i += 1
            if i >= n or data[i] != 0x3E:
                raise FilterError("ASCII85Decode: '~' without '>'")
            break
        if b == 0x7A:  # 'z'
            if group:
                raise FilterError("ASCII85Decode: 'z' inside group")
            out.extend(b"\x00\x00\x00\x00")
        elif 0x21 <= b <= 0x75:  # '!'..'u'
            group.append(b - 0x21)
            if len(group) == 5:
                flush(group, 4)
                group = []
        else:
            raise FilterError(f"ASCII85Decode: invalid character {b:#04x}")
        if len(out) > max_bytes:
            raise FilterError("ASCII85Decode output exceeds safety cap")
    if group:
        if len(group) == 1:
            raise FilterError("ASCII85Decode: lone trailing character")
        k = len(group)
        flush(group + [84] * (5 - k), k - 1)  # pad with 'u' (84)
    return bytes(out)


def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data) - len(data) % 4, 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        if acc == 0:
            out.append(0x7A)  # 'z'
            continue
        g = bytearray(5)
        for j in range(4, -1, -1):
            g[j] = 0x21 + acc % 85
            acc //= 85
        out.extend(g)
    rem = len(data) % 4
    if rem:
        acc = int.from_bytes(data[-rem:] + b"\x00" * (4 - rem), "big")
        g = bytearray(5)
        for j in range(4, -1, -1):
            g[j] = 0x21 + acc % 85
            acc //= 85
        out.extend(g[: rem + 1])
    out.extend(b"~>")
    return bytes(out)


def run_length_decode(data: bytes, max_bytes: int = MAX_DECODED_BYTES) -> bytes:
    """RunLengthDecode (PDF spec §7.4.5): length byte L; L <= 127 means
    copy the next L+1 bytes literally, L >= 129 means repeat the next
    byte 257-L times, L == 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        L = data[i]
        i += 1
        if L == 128:
            return bytes(out)
        if L <= 127:
            if i + L + 1 > n:
                raise FilterError("RunLengthDecode: truncated literal run")
            out.extend(data[i : i + L + 1])
            i += L + 1
        else:
            if i >= n:
                raise FilterError("RunLengthDecode: truncated repeat run")
            out.extend(data[i : i + 1] * (257 - L))
            i += 1
        if len(out) > max_bytes:
            raise FilterError("RunLengthDecode output exceeds safety cap")
    raise FilterError("RunLengthDecode: missing EOD (128)")


def run_length_encode(data: bytes) -> bytes:
    """Greedy run-length encoder: repeats of >= 3 become repeat runs,
    everything else literal runs (<= 128 bytes each)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literal(end: int) -> None:
        nonlocal lit_start
        while lit_start < end:
            chunk = min(128, end - lit_start)
            out.append(chunk - 1)
            out.extend(data[lit_start : lit_start + chunk])
            lit_start += chunk

    while i < n:
        j = i
        while j < n and data[j] == data[i] and j - i < 128:
            j += 1
        if j - i >= 3:
            flush_literal(i)
            out.append(257 - (j - i))
            out.append(data[i])
            lit_start = j
        i = j if j > i + 1 else i + 1
    flush_literal(n)
    out.append(128)
    return bytes(out)


_FILTERS = {
    "FlateDecode": flate_decode,
    "LZWDecode": lzw_decode,
}


def decode_stream(data: bytes, filter_names: list[str], parms: list[dict] | None = None) -> bytes:
    """Apply a filter chain to raw stream bytes.

    ``filter_names`` comes from /Filter (name or array of names);
    ``parms`` from /DecodeParms. Unknown filters raise FilterError
    (mirrors Error::UnsupporttedFilter, src/image.rs:112-130).
    """
    out = data
    for i, name in enumerate(filter_names):
        parm = (parms[i] if parms and i < len(parms) else None) or {}
        if name == "LZWDecode":
            out = lzw_decode(out, early_change=int(parm.get("EarlyChange", 1)))
            out = apply_predictor(out, parm)
        elif name == "FlateDecode":
            out = flate_decode(out)
            out = apply_predictor(out, parm)
        elif name == "DCTDecode":
            out = dct_decode(out)
        elif name == "ASCIIHexDecode":
            out = ascii_hex_decode(out)
        elif name == "ASCII85Decode":
            out = ascii85_decode(out)
        elif name == "RunLengthDecode":
            out = run_length_decode(out)
        elif name == "CCITTFaxDecode":
            from .ccitt import ccitt_decode

            out = ccitt_decode(
                out,
                k=int(parm.get("K", 0)),
                columns=int(parm.get("Columns", 1728)),
                rows=int(parm.get("Rows", 0)) or None,
                black_is_1=bool(parm.get("BlackIs1", False)),
            )
        else:
            raise FilterError("filter is not supportted")
    return out
