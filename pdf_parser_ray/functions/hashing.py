"""Deterministic hashing kernels: FNV-1a, MinHash, SimHash.

All seeds are fixed constants so results are reproducible across
processes, workers and rounds (Python's builtin ``hash`` is salted and
must never be used for data placement or fingerprints).
"""

from __future__ import annotations

import numpy as np

FNV64_OFFSET = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF

_MERSENNE61 = (1 << 61) - 1


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a (public-domain algorithm)."""
    h = FNV64_OFFSET
    for b in data:
        h = ((h ^ b) * FNV64_PRIME) & _MASK64
    return h


def fnv1a64_of_int_strings(ids: np.ndarray) -> np.ndarray:
    """Vectorized fnv1a64(str(i).encode()) for an int64 array: one
    numpy pass per DIGIT POSITION (<= 20) instead of a Python loop per
    row. uint64 arithmetic wraps natively, matching the & _MASK64."""
    s = np.char.mod("%d", ids).astype(bytes)
    width = s.dtype.itemsize
    view = s.view(np.uint8).reshape(len(s), width)
    lens = np.char.str_len(s.astype(str)).astype(np.int64)
    h = np.full(len(s), FNV64_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV64_PRIME)
    for j in range(width):
        active = lens > j
        if not active.any():
            break
        nh = (h ^ view[:, j].astype(np.uint64)) * prime
        h = np.where(active, nh, h)
    return h


def fnv1a64_of_strings(arr) -> np.ndarray:
    """Vectorized ``fnv1a64(s.encode())`` over a pyarrow string/binary
    array: the ``crc32_of_strings`` padded-byte-matrix pattern with
    uint64 FNV state — one numpy pass per byte POSITION, never a Python
    loop per row. Null/empty rows hash as the FNV offset basis (the
    hash of ``b""``). Intended for SHORT strings (tokens, urls): the
    padded matrix is n x maxlen bytes, so do not feed whole documents.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    wide = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    off_dtype = np.int64 if wide else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    lengths = np.diff(offsets)
    maxlen = int(lengths.max()) if n else 0
    h = np.full(n, FNV64_OFFSET, dtype=np.uint64)
    prime = np.uint64(FNV64_PRIME)
    if maxlen:
        col = np.arange(maxlen, dtype=offsets.dtype)
        idx = offsets[:-1, None] + col[None, :]
        valid = col[None, :] < lengths[:, None]
        np.minimum(idx, max(len(data) - 1, 0), out=idx)
        padded = np.where(valid, data[idx], 0).astype(np.uint64)
        for j in range(maxlen):
            m = valid[:, j]
            nh = (h ^ padded[:, j]) * prime
            h = np.where(m, nh, h)
    return h


def _make_crc32_table() -> np.ndarray:
    """IEEE CRC-32 (reflected, poly 0xEDB88320) byte table — the same
    algorithm as ``zlib.crc32`` (verified by tests/hypothesis)."""
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table[i] = c
    return table


_CRC32_TABLE = _make_crc32_table()


def crc32_of_strings(arr) -> np.ndarray:
    """Vectorized ``zlib.crc32`` over a pyarrow string/binary array.

    Works column-wise over a zero-copy padded byte matrix: one numpy
    pass per byte POSITION (urls are ~40 bytes → ~40 passes over n
    rows), never a Python loop per row. Nulls hash as empty (crc 0).
    Returns uint32 per row, identical to ``zlib.crc32(s.encode())``.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets)  # null rows have zero extent in offsets
    maxlen = int(lengths.max()) if n else 0
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    if maxlen:
        col = np.arange(maxlen, dtype=offsets.dtype)
        idx = offsets[:-1, None] + col[None, :]
        valid = col[None, :] < lengths[:, None]
        np.minimum(idx, max(len(data) - 1, 0), out=idx)
        padded = np.where(valid, data[idx], 0).astype(np.uint32)
        for j in range(maxlen):
            m = valid[:, j]
            nxt = (crc >> np.uint32(8)) ^ _CRC32_TABLE[(crc ^ padded[:, j]) & np.uint32(0xFF)]
            crc = np.where(m, nxt, crc)
    crc ^= np.uint32(0xFFFFFFFF)
    # rows that were all-null / empty: crc32(b"") == 0
    crc[lengths == 0] = 0
    return crc


def blake2b128_of_strings(arr) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content keys as two int64 arrays: blake2b-16 of each
    row's bytes, hashed from ZERO-COPY buffer views of a pyarrow
    string/binary column — no per-row Python string materialization,
    no encode() round-trip, outputs built as numpy arrays once.
    Null/empty rows hash as empty bytes."""
    import hashlib

    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    h1 = np.empty(n, dtype=np.int64)
    h2 = np.empty(n, dtype=np.int64)
    if n == 0:
        return h1, h2
    bufs = arr.buffers()
    wide = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    off_dtype = np.int64 if wide else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    blake = hashlib.blake2b
    from_bytes = int.from_bytes
    half = 1 << 63
    for i in range(n):
        d = blake(data[offsets[i] : offsets[i + 1]], digest_size=16).digest()
        h1[i] = from_bytes(d[:8], "big") - half
        h2[i] = from_bytes(d[8:], "big") - half
    return h1, h2


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """uint64 hashes of the n-gram shingle set of a token list
    (reference implementation; TokenHasher is the fast path)."""
    if len(tokens) < n:
        shingles = {" ".join(tokens)} if tokens else set()
    else:
        shingles = {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}
    return np.fromiter(
        (fnv1a64(s.encode("utf-8")) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


class TokenHasher:
    """Vectorized shingle hashing with a warm per-actor token cache.

    Each distinct token is hashed once (blake2b-8, C speed, cached —
    corpus vocabularies are tiny relative to token counts); n-gram
    shingle hashes are then a single vectorized mix over the token-hash
    windows. Produces a DIFFERENT hash family than ``shingle_hashes``
    but the same shingle-set identity semantics, which is all MinHash/
    SimHash/Jaccard need.
    """

    _C1 = np.uint64(0x9E3779B97F4A7C15)
    _C2 = np.uint64(0xC2B2AE3D27D4EB4F)
    _C3 = np.uint64(0x165667B19E3779F9)

    def __init__(self):
        import hashlib

        self._blake = hashlib.blake2b
        self._cache: dict[str, int] = {}

    def _token_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(
                self._blake(tok.encode("utf-8"), digest_size=8).digest(), "big"
            )
            self._cache[tok] = h
        return h

    def shingle_hashes(self, tokens: list[str], n: int = 3) -> np.ndarray:
        """uint64 hashes of the n-gram shingle SET (deduplicated)."""
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        th = np.fromiter(
            (self._token_hash(t) for t in tokens),
            dtype=np.uint64,
            count=len(tokens),
        )
        if len(tokens) < n:
            h = 0
            for k in range(len(tokens)):
                h = ((h * 0x9E3779B97F4A7C15) ^ (int(th[k]) * 0xC2B2AE3D27D4EB4F)) & _MASK64
            return np.array([h], dtype=np.uint64)
        with np.errstate(over="ignore"):
            w0 = th[: len(th) - n + 1] * self._C1
            w1 = th[1 : len(th) - n + 2] * self._C2
            w2 = th[2 : len(th) - n + 3] * self._C3
            mixed = w0 ^ w1 ^ w2
            mixed ^= mixed >> np.uint64(29)
            mixed *= np.uint64(0xFF51AFD7ED558CCD)
        return np.unique(mixed)


class MinHasher:
    """k minhashes via a xorshift-multiply mixing family (one fixed
    random seed per hash function); banding with ``bands`` bands of
    ``k // bands`` rows each. Fully vectorized uint64 (wrapping
    multiply is intentional)."""

    _MIX = np.uint64(0xFF51AFD7ED558CCD)  # Murmur3 finalizer constant

    def __init__(self, k: int = 64, bands: int = 16, seed: int = 0x5EED):
        rng = np.random.RandomState(seed)
        self.k = k
        self.bands = bands
        self.rows = k // bands
        self.seeds = rng.randint(0, 1 << 63, size=k, dtype=np.int64).astype(np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(k,) uint64 minhash signature of a shingle-hash set."""
        if len(hashes) == 0:
            return np.full(self.k, _MASK64, dtype=np.uint64)
        with np.errstate(over="ignore"):
            y = (hashes[None, :] ^ self.seeds[:, None]) * self._MIX
            y ^= y >> np.uint64(33)
            y *= np.uint64(0xC4CEB9FE1A85EC53)
            y ^= y >> np.uint64(33)
        return y.min(axis=1)

    def signatures_batch(self, hash_arrays: list[np.ndarray]) -> np.ndarray:
        """(k, n_docs) uint64 signatures for a whole batch in ONE
        vectorized pass: all shingle sets concatenate into a single
        array, the k mixing functions apply once, and per-doc minima
        come from ``np.minimum.reduceat`` at the doc offsets — no
        per-document numpy dispatch (the per-doc path costs ~100us of
        overhead each; this is the dedup fleet's hot stage)."""
        n = len(hash_arrays)
        if n == 0:
            return np.empty((self.k, 0), dtype=np.uint64)
        lens = np.array([len(h) for h in hash_arrays], dtype=np.int64)
        out = np.full((self.k, n), _MASK64, dtype=np.uint64)
        # chunk at ~200k shingles: the (k x shingles) mixing matrix is
        # 512 B/shingle — an unchunked 1024-doc batch of long texts
        # would transiently hold ~1 GB per actor
        CHUNK = 200_000
        start = 0
        while start < n:
            end = start
            total = 0
            while end < n and (total == 0 or total + lens[end] <= CHUNK):
                total += int(lens[end])
                end += 1
            idx = np.arange(start, end)
            sub_lens = lens[idx]
            nonempty = sub_lens > 0
            if nonempty.any():
                allh = np.concatenate(
                    [hash_arrays[i] for i in idx if len(hash_arrays[i])]
                )
                with np.errstate(over="ignore"):
                    y = (allh[None, :] ^ self.seeds[:, None]) * self._MIX
                    y ^= y >> np.uint64(33)
                    y *= np.uint64(0xC4CEB9FE1A85EC53)
                    y ^= y >> np.uint64(33)
                offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(sub_lens[nonempty][:-1], out=offsets[1:])
                out[:, idx[nonempty]] = np.minimum.reduceat(y, offsets, axis=1)
            start = end
        return out

    def band_keys_batch(self, sigs: np.ndarray) -> np.ndarray:
        """(bands, n_docs) int64 bucket keys from batch signatures via
        a vectorized 64-bit mix over each band's rows + the band id.
        Identical band chunks collide identically — all LSH banding
        requires; the key family is deterministic across processes."""
        k, n = sigs.shape
        chunks = sigs.reshape(self.bands, self.rows, n)
        with np.errstate(over="ignore"):
            acc = np.full((self.bands, n), 0x9E3779B97F4A7C15, dtype=np.uint64)
            acc ^= np.arange(self.bands, dtype=np.uint64)[:, None] * np.uint64(
                0xC2B2AE3D27D4EB4F
            )
            for r in range(self.rows):
                acc = (acc ^ chunks[:, r, :]) * self._MIX
                acc ^= acc >> np.uint64(29)
        return acc.view(np.int64)  # bit-reinterpret: int64 for Arrow


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash over a shingle-hash set."""
    if len(hashes) == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    counts = bits.sum(axis=0)
    vote = (counts * 2) >= len(hashes)
    return int(np.packbits(vote[::-1]).view(">u8")[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
