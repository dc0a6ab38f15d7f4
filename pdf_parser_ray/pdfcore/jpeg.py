"""Pure-Python baseline JPEG (ITU-T T.81 / ISO 10918-1) codec.

Closes the reference's DCTDecode arm (``/root/reference``
src/image.rs:140-143 decodes image XObjects via a JPEG crate; this
container has no codec, so the engine carries its own):

- ``decode_jpeg``: baseline sequential DCT (SOF0/1) AND progressive
  DCT (SOF2, Annex G: spectral selection x successive approximation,
  DC/AC first + refinement scans, EOB runs), 8-bit, grayscale or
  YCbCr (4:4:4 / 4:2:2 / 4:2:0 with nearest-neighbor chroma
  upsampling), restart markers, 8/16-bit DQT precision. Hierarchical
  and arithmetic coding raise ``JpegError``.
- ``encode_jpeg``: baseline encoder (4:4:4, spec Annex K standard
  Huffman tables, caller-chosen flat quantization — the default
  all-ones tables make the roundtrip near-lossless, which the tests
  pin), used by the CLI's ``{page}-{image}.jpg`` sink (reference
  src/main.rs:36-42 parity) and to build DCT fixtures.
- ``encode_progressive_jpeg``: progressive encoder (test/fixture
  support); with full refinement its coefficients equal the baseline
  encoder's, so progressive decode must match baseline decode byte
  for byte — the tests' oracle.

Everything here derives from the public JPEG specification; the IDCT
is the textbook separable orthonormal transform, vectorized with
numpy.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(Exception):
    pass


# -- shared tables -----------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUM = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(code_length, code) -> symbol, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the received bits to a signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# -- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    unstuffing; stops at any non-RST marker.

    The accumulator is truncated after every consume (unbounded bignum
    growth would make decode quadratic in stream size), and pad bits
    appended past the real data are TRACKED: a symbol that needs one
    is a truncated stream and raises (the reference's jpeg crate
    errors there too — zero-filled MCUs must not pass as decoded)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.pad = 0  # pad bits currently in acc (always the lowest)

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc <<= 8
                self.nbits += 8
                self.pad += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF data byte
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                else:  # RST / EOI / next segment: stop consuming, pad
                    self.acc <<= 8
                    self.pad += 8
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        if self.nbits <= self.pad:
            raise JpegError("entropy data truncated")
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def read_magnitude(self, size: int) -> int:
        """SSSS-category receive: sizes above 16 cannot occur in any
        legal 8-bit stream (hostile DHTs could otherwise demand
        read_bits(200) and build bignum coefficients)."""
        if size > 16:
            raise JpegError(f"invalid magnitude category {size}")
        return self.read_bits(size)

    def sync_to_restart(self):
        """Skip to just past the next RSTn marker; reset bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.pad = 0
                return
            p += 1
        raise JpegError("restart marker not found")


def _idct2(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT: f = A^T F A (A orthonormal DCT-II basis)."""
    return _A.T @ coef @ _A


# decoded-plane safety cap (mirrors filters.MAX_DECODED_BYTES intent:
# one hostile row must not OOM a task); 16M px keeps the float64
# working planes of a 3-component image under ~400 MB
MAX_PIXELS = 16_000_000


def _parse_dqt(seg: bytes, qt: dict) -> None:
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0xF
        i += 1
        if pq == 0:
            qt[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
            i += 64
        else:
            qt[tq] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
            i += 128


def _parse_dht(seg: bytes, huff: dict) -> None:
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0xF
        i += 1
        bits = [0] + list(seg[i : i + 16])
        i += 16
        n = sum(bits)
        huff[(tc, th)] = _build_decode_table(bits, seg[i : i + n])
        i += n


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG. Returns (width, height, n_components,
    pixels) — pixels are row-major RGB (3 comp) or gray (1 comp).
    Malformed input raises ``JpegError`` (never a raw struct/index
    error — the per-row error channel depends on that contract)."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (
        struct.error,
        IndexError,
        KeyError,
        ValueError,
        TypeError,
        ZeroDivisionError,
        OverflowError,
    ) as e:
        raise JpegError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        # tolerate legal 0xFF fill bytes before the marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            if w == 0 or h == 0:
                raise JpegError("zero image dimension")
            if w * h > MAX_PIXELS:
                raise JpegError(f"image exceeds safety cap ({w}x{h})")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise JpegError(f"invalid sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": seg[8 + 3 * c]})
            hmax_ = max(c["h"] for c in comps)
            vmax_ = max(c["v"] for c in comps)
            for c in comps:
                if hmax_ % c["h"] or vmax_ % c["v"]:
                    raise JpegError("non-integer subsampling ratio")
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF marker 0xFF{marker:02X} (not baseline/progressive)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            if frame["progressive"]:
                # hand the whole remaining stream (from this SOS) to
                # the multi-scan progressive loop
                return _decode_progressive(
                    data, pos - 2, frame, qt, huff, restart_interval
                )
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF
                scan_tables[cs] = (td, ta)
            return _decode_scan(
                data, pos + seglen, frame, qt, huff, scan_tables, restart_interval
            )
        pos += seglen
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, frame, qt, huff, scan_tables, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise JpegError(f"unsupported component count {ncomp}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    pred = [0] * ncomp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_to_restart()
                pred = [0] * ncomp
            for ci, c in enumerate(comps):
                td, ta = scan_tables[c["id"]]
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                q = qt.get(c["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise JpegError("missing Huffman/quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_magnitude(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index out of range")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        block = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    return _finish_planes(frame, planes)


def _finish_planes(frame, planes) -> tuple[int, int, int, bytes]:
    """Upsample (nearest-neighbor chroma replication) + color convert
    — shared by the baseline and progressive decode paths."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()

    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()


# -- progressive decoding (SOF2, T.81 Annex G) -------------------------------


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next non-stuffed, non-RST marker at/after pos."""
    p = pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    raise JpegError("unterminated scan (no trailing marker)")


def _decode_progressive(data, pos, frame, qt, huff, restart_interval):
    """Multi-scan progressive decode: coefficients accumulate across
    DC/AC first + refinement scans (spectral selection x successive
    approximation); dequantize + IDCT once at EOI."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) not in (1, 3):
        raise JpegError(f"unsupported component count {len(comps)}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # the component's OWN block grid (non-interleaved scans)
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["bw_c"] = -(-cw // 8)
        c["bh_c"] = -(-ch // 8)
        # zig-zag-ordered coefficients, accumulated across scans
        c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int32)

    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        # tolerate legal 0xFF fill bytes before the marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xC4:
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td, ta = seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF
                matches = [j for j, c in enumerate(comps) if c["id"] == cs]
                if not matches:
                    raise JpegError(f"scan references unknown component {cs}")
                scomps.append((matches[0], td, ta))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _progressive_scan(
                data,
                pos + seglen,
                comps,
                scomps,
                huff,
                ss,
                se,
                ah,
                al,
                restart_interval,
                mcux,
                mcuy,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise JpegError("no SOS marker found")

    # finish: dequantize + IDCT every block (vectorized per component)
    planes = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing quant table")
        natural = np.zeros((c["bh"], c["bw"], 64), dtype=np.float64)
        natural[..., ZIGZAG] = c["coef"] * q
        blocks = natural.reshape(c["bh"], c["bw"], 8, 8)
        spatial = np.einsum("xu,rcuv,vy->rcxy", _A.T, blocks, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        planes.append(plane)
    return _finish_planes(frame, planes)


def _progressive_scan(
    data, pos, comps, scomps, huff, ss, se, ah, al, ri, mcux, mcuy
):
    """Decode one progressive scan; returns the position of the next
    marker after its entropy data."""
    reader = _BitReader(data, pos)
    state = {"eobrun": 0}

    if ss == 0:  # ---- DC scan ----
        if se != 0:
            raise JpegError("DC scan with Se != 0")
        preds = [0] * len(scomps)

        def dc_block(si, ci, row, col):
            c = comps[ci]
            blk = c["coef"][row, col]
            if ah == 0:
                td = scomps[si][1]
                tbl = huff.get((0, td))
                if tbl is None:
                    raise JpegError("missing DC table")
                size = reader.decode_symbol(tbl)
                preds[si] += _extend(reader.read_magnitude(size), size)
                blk[0] = preds[si] << al
            else:  # refinement: one bit per block
                if reader.read_bit():
                    blk[0] |= 1 << al

        if len(scomps) > 1:  # interleaved MCU order
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        reader.sync_to_restart()
                        preds = [0] * len(scomps)
                    for si, (ci, _, _) in enumerate(scomps):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    si, ci, my * c["v"] + by, mx * c["h"] + bx
                                )
                    unit += 1
        else:
            ci = scomps[0][0]
            c = comps[ci]
            unit = 0
            for row in range(c["bh_c"]):
                for col in range(c["bw_c"]):
                    if ri and unit and unit % ri == 0:
                        reader.sync_to_restart()
                        preds = [0] * len(scomps)
                    dc_block(0, ci, row, col)
                    unit += 1
    else:  # ---- AC scan: exactly one component (T.81 G.1.1.1.1) ----
        if len(scomps) != 1:
            raise JpegError("interleaved AC progressive scan")
        if not (1 <= ss <= se <= 63):
            raise JpegError("invalid spectral band")
        ci, _, ta = scomps[0]
        tbl = huff.get((1, ta))
        if tbl is None:
            raise JpegError("missing AC table")
        c = comps[ci]
        unit = 0
        for row in range(c["bh_c"]):
            for col in range(c["bw_c"]):
                if ri and unit and unit % ri == 0:
                    reader.sync_to_restart()
                    state["eobrun"] = 0
                blk = c["coef"][row, col]
                if ah == 0:
                    _ac_first_block(reader, tbl, blk, ss, se, al, state)
                else:
                    _ac_refine_block(reader, tbl, blk, ss, se, al, state)
                unit += 1

    return _next_marker(data, reader.pos)


def _ac_first_block(reader, tbl, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) + reader.read_bits(r) - 1
            return
        k += r
        if k > se:
            raise JpegError("AC index out of band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine_block(reader, tbl, blk, ss, se, al, state):
    """T.81 G.1.2.3 successive-approximation AC refinement: correction
    bits for history-nonzero coefficients ride inline with the
    run/newly-nonzero symbols."""
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        cur = int(blk[k])
        if reader.read_bit() and (abs(cur) & p1) == 0:
            blk[k] = cur + (p1 if cur > 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_symbol(tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) + reader.read_bits(r)
                    break
                val = 0  # ZRL: advance over 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("invalid AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


# -- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.acc &= (1 << self.nbits) - 1  # keep acc bounded
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _fdct2(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT: F = A f A^T."""
    return _A @ block @ _A.T


def _jfif_headers(
    ncomp: int, width: int, height: int, quant: int, sof_marker: bytes
) -> bytearray:
    """SOI + APP0 + DQT + SOF + standard DHTs — shared by the baseline
    and progressive encoders (they MUST stay bit-identical for the
    progressive==baseline oracle to hold)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([quant] * 64)
    out += sof_marker + struct.pack(">H", 8 + 3 * ncomp) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0

    def _dht(tc, th, bits, huffval):
        payload = bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += _dht(0, 0, *_STD_DC_LUM)
    out += _dht(1, 0, *_STD_AC_LUM)
    if ncomp == 3:
        out += _dht(0, 1, *_STD_DC_CHR)
        out += _dht(1, 1, *_STD_AC_CHR)
    return out


def _check_encode_args(pixels, width, height, ncomp, quant):
    if ncomp not in (1, 3):
        raise JpegError("encoder supports 1 or 3 components")
    if len(pixels) != width * height * ncomp:
        raise JpegError("pixel buffer size mismatch")
    if not 1 <= quant <= 255:
        raise JpegError("quant must be 1..255")


def _encode_zz_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_tbl, ac_tbl) -> int:
    """Baseline-entropy-code one zig-zag quantized block."""
    diff = int(zz[0]) - pred
    size = 0 if diff == 0 else abs(diff).bit_length()
    code, length = dc_tbl[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tbl[0xF0]
            bw.write(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = ac_tbl[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        c, ln = ac_tbl[0x00]
        bw.write(c, ln)
    return int(zz[0])


def encode_jpeg(
    pixels: bytes, width: int, height: int, ncomp: int, quant: int = 1
) -> bytes:
    """Baseline 4:4:4 encoder; ``quant`` is a flat quantization value
    (1 = near-lossless; larger = lossier). ``pixels`` row-major RGB
    (ncomp=3) or gray (ncomp=1)."""
    _check_encode_args(pixels, width, height, ncomp, quant)
    zzs, by, bx = _quantized_zz_blocks(pixels, width, height, ncomp, quant)

    out = _jfif_headers(ncomp, width, height, quant, b"\xff\xc0")
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tbl = 0 if cid == 1 else 1
        out += bytes([cid, (tbl << 4) | tbl])
    out += b"\x00\x3f\x00"

    dc_tbls = [
        _build_encode_table(*(_STD_DC_LUM if c == 0 else _STD_DC_CHR))
        for c in range(ncomp)
    ]
    ac_tbls = [
        _build_encode_table(*(_STD_AC_LUM if c == 0 else _STD_AC_CHR))
        for c in range(ncomp)
    ]
    bw = _BitWriter()
    pred = [0] * ncomp
    for r_ in range(by):
        for c_ in range(bx):
            for ci in range(ncomp):
                pred[ci] = _encode_zz_block(
                    bw, zzs[ci][r_, c_], pred[ci], dc_tbls[ci], ac_tbls[ci]
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# -- progressive encoder (test/fixture support) ------------------------------


def _sym(bw: _BitWriter, tbl: dict, symbol: int) -> None:
    code, length = tbl[symbol]
    bw.write(code, length)


def _quantized_zz_blocks(pixels, width, height, ncomp, quant):
    """Per component: (by, bx, 64) int64 zig-zag quantized coefficient
    blocks (4:4:4, edge-replicated padding) — shared math with the
    baseline encoder."""
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, ncomp)
        .astype(np.float64)
    )
    if ncomp == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        chans = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        chans = [arr[..., 0]]
    q = np.full(64, quant, dtype=np.int64)
    by = (height + 7) // 8
    bx = (width + 7) // 8
    out = []
    for ch in chans:
        p = np.empty((by * 8, bx * 8))
        p[:height, :width] = ch
        p[height:, :width] = ch[-1:, :]
        p[:, width:] = p[:, width - 1 : width]
        zz = np.empty((by, bx, 64), dtype=np.int64)
        for r_ in range(by):
            for c_ in range(bx):
                coef = _fdct2(p[r_ * 8 : r_ * 8 + 8, c_ * 8 : c_ * 8 + 8] - 128.0)
                zz[r_, c_] = np.round(coef.reshape(64)[ZIGZAG] / q)
        out.append(zz)
    return out, by, bx


def _enc_ac_first(bw, tbl, zz, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform truncates toward zero
        if t == 0:
            r += 1
            continue
        while r > 15:
            _sym(bw, tbl, 0xF0)
            r -= 16
        s = t.bit_length()
        _sym(bw, tbl, (r << 4) | s)
        vv = t if v > 0 else -t
        bw.write(vv if vv >= 0 else vv + (1 << s) - 1, s)
        r = 0
    if r:
        _sym(bw, tbl, 0x00)  # EOB0 (no cross-block EOB runs emitted)


def _enc_ac_refine(bw, tbl, zz, ss, se, al):
    """Mirror of _ac_refine_block: ZRL triggers at ANY nonzero once the
    zero-history run exceeds 15 (and only if a newly-nonzero
    coefficient still follows); correction bits buffer between symbols
    and flush after each emitted symbol / the final EOB."""
    vals = [int(zz[k]) for k in range(ss, se + 1)]
    lo = [abs(v) >> al for v in vals]
    hi = [abs(v) >> (al + 1) for v in vals]
    last_new = -1
    for i in range(len(vals)):
        if hi[i] == 0 and lo[i] != 0:
            last_new = i
    r = 0
    buf: list[int] = []
    for i in range(len(vals)):
        if lo[i] == 0:
            r += 1
            continue
        while r > 15 and i <= last_new:
            _sym(bw, tbl, 0xF0)
            r -= 16
            for b in buf:
                bw.write(b, 1)
            buf = []
        if hi[i] != 0:  # history-nonzero: correction bit
            buf.append(lo[i] & 1)
            continue
        # newly nonzero at this level (magnitude is exactly 1)
        _sym(bw, tbl, (r << 4) | 1)
        bw.write(1 if vals[i] > 0 else 0, 1)
        r = 0
        for b in buf:
            bw.write(b, 1)
        buf = []
    if r or buf:
        _sym(bw, tbl, 0x00)
        for b in buf:
            bw.write(b, 1)


def encode_progressive_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    ncomp: int,
    quant: int = 1,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive (SOF2) 4:4:4 encoder exercising every Annex G
    decode path: interleaved DC first scan at Al=dc_al + refinement
    scans down to 0, then per-component spectral-band AC first scans
    at Al=ac_al + refinement scans down to 0. Full refinement makes
    the coefficients IDENTICAL to the baseline encoder's, so decoded
    pixels must equal the baseline decode byte for byte (the test
    oracle)."""
    _check_encode_args(pixels, width, height, ncomp, quant)
    zzs, by, bx = _quantized_zz_blocks(pixels, width, height, ncomp, quant)
    out = _jfif_headers(ncomp, width, height, quant, b"\xff\xc2")

    dc_tbls = [_build_encode_table(*(_STD_DC_LUM if c == 0 else _STD_DC_CHR)) for c in range(ncomp)]
    ac_tbls = [_build_encode_table(*(_STD_AC_LUM if c == 0 else _STD_AC_CHR)) for c in range(ncomp)]

    def _sos(comp_specs, ss, se, ah, al):
        seg = bytearray([len(comp_specs)])
        for cid, td, ta in comp_specs:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + bytes(seg)

    # ---- DC first scan (interleaved, Al=dc_al) ----
    out += _sos([(c + 1, 0 if c == 0 else 1, 0) for c in range(ncomp)], 0, 0, 0, dc_al)
    bw = _BitWriter()
    preds = [0] * ncomp
    for r_ in range(by):
        for c_ in range(bx):
            for ci in range(ncomp):
                dc = int(zzs[ci][r_, c_, 0]) >> dc_al  # arithmetic shift
                diff = dc - preds[ci]
                preds[ci] = dc
                size = 0 if diff == 0 else abs(diff).bit_length()
                _sym(bw, dc_tbls[ci], size)
                if size:
                    bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    bw.flush()
    out += bw.out

    # ---- DC refinement scans ----
    for lv in range(dc_al - 1, -1, -1):
        out += _sos(
            [(c + 1, 0, 0) for c in range(ncomp)], 0, 0, lv + 1, lv
        )
        bw = _BitWriter()
        for r_ in range(by):
            for c_ in range(bx):
                for ci in range(ncomp):
                    bw.write((int(zzs[ci][r_, c_, 0]) >> lv) & 1, 1)
        bw.flush()
        out += bw.out

    # ---- AC scans: per component, per spectral band ----
    for ci in range(ncomp):
        ta = 0 if ci == 0 else 1
        for ss, se in bands:
            out += _sos([(ci + 1, 0, ta)], ss, se, 0, ac_al)
            bw = _BitWriter()
            for r_ in range(by):
                for c_ in range(bx):
                    _enc_ac_first(bw, ac_tbls[ci], zzs[ci][r_, c_], ss, se, ac_al)
            bw.flush()
            out += bw.out
            for lv in range(ac_al - 1, -1, -1):
                out += _sos([(ci + 1, 0, ta)], ss, se, lv + 1, lv)
                bw = _BitWriter()
                for r_ in range(by):
                    for c_ in range(bx):
                        _enc_ac_refine(bw, ac_tbls[ci], zzs[ci][r_, c_], ss, se, lv)
                bw.flush()
                out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
