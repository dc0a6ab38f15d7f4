"""CCITTFaxDecode codec (ITU-T T.4 / T.6), pure Python.

Implements the two profiles scanned-document PDFs actually use:
Group 4 / MMR (``K < 0``, /CCITTFaxDecode's default in the wild) and
Group 3 one-dimensional MH (``K = 0``, EndOfLine false). The encoder
exists so synthetic corpora and tests can roundtrip real CCITT data
(the reference's filter enum is closed at Flate+DCT —
/root/reference/src/image.rs:112-130 — this is a north-star
extension like LZW/A85 in filters.py).

Code tables are transcribed from the published T.4 tables (white and
black terminating codes 0-63, makeup codes 64-1728, shared extended
makeups 1792-2560) and the T.6 mode codes. Transcription is the one
step that cannot be generated from first principles, so
tests/test_ccitt.py (a) pins well-known codewords against the spec
values, and (b) verifies each decode alphabet is prefix-free and
duplicate-free — the failure mode of a typo'd table.

Bit conventions follow the PDF semantics: decoded output is packed
1-bit rows, MSB first, each row padded to a byte boundary; with
``BlackIs1`` false (the default) 0 bits are black, 1 bits are white.
"""

from __future__ import annotations

from .errors import FilterError

# T.4 white run codes: run length -> bit string
WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup codes
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

# T.4 black run codes
BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # makeup codes
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes shared by both colors (T.4 table 3)
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 two-dimensional mode codes
MODE_PASS = "0001"
MODE_HORIZ = "001"
MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
          -1: "010", -2: "000010", -3: "0000010"}
EOL = "000000000001"


def _decode_alphabet(codes: dict) -> dict:
    out = {bits: run for run, bits in codes.items()}
    out.update({bits: run for run, bits in EXT_MAKEUP.items()})
    return out


_WHITE_DECODE = _decode_alphabet(WHITE_CODES)
_BLACK_DECODE = _decode_alphabet(BLACK_CODES)
_MODE_DECODE = {bits: ("v", d) for d, bits in MODE_V.items()}
_MODE_DECODE[MODE_PASS] = ("pass", 0)
_MODE_DECODE[MODE_HORIZ] = ("horiz", 0)
_MAX_CODE_LEN = 14


class _BitWriter:
    def __init__(self):
        self.bits: list[str] = []

    def write(self, s: str) -> None:
        self.bits.append(s)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def read_code(self, alphabet: dict, what: str):
        """Longest-prefix-free match: accumulate bits until a codeword
        of the alphabet matches (codes are prefix-free, so the first
        match is THE match)."""
        s = []
        while len(s) < _MAX_CODE_LEN:
            if self.pos >= self.nbits:
                raise FilterError(f"CCITT: truncated {what} code")
            byte = self.data[self.pos >> 3]
            s.append("1" if byte & (0x80 >> (self.pos & 7)) else "0")
            self.pos += 1
            hit = alphabet.get("".join(s))
            if hit is not None:
                return hit
        raise FilterError(f"CCITT: invalid {what} code {''.join(s)!r}")


def _read_run(r: _BitReader, white: bool) -> int:
    """One full run length: zero or more makeup codes + a terminating
    code (< 64)."""
    total = 0
    alphabet = _WHITE_DECODE if white else _BLACK_DECODE
    while True:
        run = r.read_code(alphabet, "white run" if white else "black run")
        total += run
        if run < 64:
            return total


def _write_run(w: _BitWriter, run: int, white: bool) -> None:
    """Makeup codes (largest multiple of 64, capped at 2560) followed
    by a terminating code < 64 — every run ends with a terminator."""
    codes = WHITE_CODES if white else BLACK_CODES
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        w.write(EXT_MAKEUP[m] if m >= 1792 else codes[m])
        run -= m
    w.write(codes[run])


def _row_to_runs(row: bytes) -> list[int]:
    """0/1 pixel bytes -> alternating run lengths starting with white
    (possibly 0-length first run)."""
    runs = []
    cur = 1  # white
    n = 0
    for px in row:
        if px == cur:
            n += 1
        else:
            runs.append(n)
            cur = px
            n = 1
    runs.append(n)
    return runs


def _pack_rows(rows: list[bytes], columns: int, black_is_1: bool) -> bytes:
    """0/1 pixel rows -> PDF packed output (MSB-first, byte-aligned
    rows; BlackIs1 false => black pixels become 0 bits)."""
    stride = (columns + 7) // 8
    out = bytearray(stride * len(rows))
    for ri, row in enumerate(rows):
        base = ri * stride
        for ci, px in enumerate(row):
            bit = px if not black_is_1 else 1 - px
            if bit:
                out[base + (ci >> 3)] |= 0x80 >> (ci & 7)
    return bytes(out)


def _changing_elements(row: bytes) -> list[int]:
    """Positions where color changes vs the previous pixel (first
    pixel's imaginary predecessor is white)."""
    out = []
    prev = 1
    for i, px in enumerate(row):
        if px != prev:
            out.append(i)
            prev = px
    return out


# -- Group 3 one-dimensional (K = 0, EndOfLine false) ------------------------


def g3_1d_encode(pixels: bytes, columns: int, rows: int) -> bytes:
    """``pixels`` = rows*columns bytes of 0 (black) / 1 (white)."""
    if len(pixels) != columns * rows:
        raise FilterError("CCITT: pixel buffer size mismatch")
    w = _BitWriter()
    for ri in range(rows):
        row = pixels[ri * columns : (ri + 1) * columns]
        white = True
        for run in _row_to_runs(row):
            _write_run(w, run, white)
            white = not white
    return w.tobytes()


def g3_1d_decode(data: bytes, columns: int, rows: int) -> list[bytes]:
    r = _BitReader(data)
    out = []
    for _ in range(rows):
        row = bytearray()
        white = True
        while len(row) < columns:
            run = _read_run(r, white)
            if len(row) + run > columns:
                raise FilterError("CCITT: run overflows row")
            row += bytes([1 if white else 0]) * run
            white = not white
        out.append(bytes(row))
    return out


# -- Group 4 / MMR (K < 0) ----------------------------------------------------


def g4_encode(pixels: bytes, columns: int, rows: int) -> bytes:
    if len(pixels) != columns * rows:
        raise FilterError("CCITT: pixel buffer size mismatch")
    w = _BitWriter()
    ref = bytes([1]) * columns  # imaginary all-white line
    for ri in range(rows):
        row = pixels[ri * columns : (ri + 1) * columns]
        changes = _changing_elements(row)
        ref_changes = _changing_elements(ref)
        a0 = -1
        color = 1  # white
        while a0 < columns:
            a1 = next((c for c in changes if c > a0), columns)
            # b1: first ref change > a0 with color opposite of a0's color
            # (i.e. same color as a1's new color)
            b1 = columns
            for idx, c in enumerate(ref_changes):
                if c > a0 and (idx % 2 == 0) == (color == 1):
                    b1 = c
                    break
            b2 = next((c for c in ref_changes if c > b1), columns)
            if b2 < a1:
                w.write(MODE_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                w.write(MODE_V[a1 - b1])
                a0 = a1
                color = 1 - color
            else:
                a2 = next((c for c in changes if c > a1), columns)
                w.write(MODE_HORIZ)
                start = a0 if a0 > 0 else 0
                _write_run(w, a1 - start, color == 1)
                _write_run(w, a2 - a1, color == 0)
                a0 = a2
        ref = row
    w.write(EOL + EOL)  # EOFB
    return w.tobytes()


def g4_decode(data: bytes, columns: int, rows: int) -> list[bytes]:
    r = _BitReader(data)
    out: list[bytes] = []
    ref = bytes([1]) * columns
    for _ in range(rows):
        row = bytearray()
        ref_changes = _changing_elements(ref)
        a0 = -1
        color = 1
        while len(row) < columns:
            kind, delta = r.read_code(_MODE_DECODE, "mode")
            b1 = columns
            for idx, c in enumerate(ref_changes):
                if c > a0 and (idx % 2 == 0) == (color == 1):
                    b1 = c
                    break
            b2 = next((c for c in ref_changes if c > b1), columns)
            start = a0 if a0 > 0 else 0
            if kind == "pass":
                row += bytes([color]) * (b2 - start)
                a0 = b2
            elif kind == "v":
                a1 = b1 + delta
                if not start <= a1 <= columns:
                    raise FilterError("CCITT: vertical mode out of range")
                row += bytes([color]) * (a1 - start)
                a0 = a1
                color = 1 - color
            else:  # horizontal: two explicit runs
                run1 = _read_run(r, color == 1)
                run2 = _read_run(r, color == 0)
                if start + run1 + run2 > columns:
                    raise FilterError("CCITT: horizontal runs overflow row")
                row += bytes([color]) * run1
                row += bytes([1 - color]) * run2
                a0 = start + run1 + run2
            if len(row) > columns:
                raise FilterError("CCITT: row overflow")
        out.append(bytes(row))
        ref = bytes(row)
    return out


# -- PDF filter entry ----------------------------------------------------------


def ccitt_encode(
    pixels: bytes, columns: int, rows: int, k: int = -1
) -> bytes:
    """0/1 pixel bytes -> CCITT data (G4 for k<0, G3-1D for k==0)."""
    if k < 0:
        return g4_encode(pixels, columns, rows)
    if k == 0:
        return g3_1d_encode(pixels, columns, rows)
    raise FilterError(f"CCITT: K > 0 (mixed 2D) unsupported, got {k}")


def ccitt_decode(
    data: bytes,
    k: int = 0,
    columns: int = 1728,
    rows: int | None = None,
    black_is_1: bool = False,
) -> bytes:
    """/CCITTFaxDecode: returns PDF-packed 1-bit rows. ``rows`` must
    come from the image /Height (PDF always knows it; the
    end-of-block scan real fax machines need is out of scope)."""
    if rows is None or rows <= 0:
        raise FilterError("CCITT: Rows (image height) required")
    if columns <= 0:
        raise FilterError("CCITT: bad Columns")
    if k < 0:
        rowpx = g4_decode(data, columns, rows)
    elif k == 0:
        rowpx = g3_1d_decode(data, columns, rows)
    else:
        raise FilterError(f"CCITT: K > 0 (mixed 2D) unsupported, got {k}")
    return _pack_rows(rowpx, columns, black_is_1)
