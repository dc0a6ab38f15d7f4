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

    def band_keys(self, sig: np.ndarray) -> list[int]:
        """One uint64 bucket key per band (band id mixed in)."""
        import hashlib

        keys = []
        for band in range(self.bands):
            chunk = sig[band * self.rows : (band + 1) * self.rows]
            h = int.from_bytes(
                hashlib.blake2b(
                    chunk.tobytes() + bytes([band]), digest_size=8
                ).digest(),
                "big",
            )
            keys.append(h)
        return keys


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
