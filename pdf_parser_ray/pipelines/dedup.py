"""Deduplication operators (build mandate): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes:
- exact dedup: add the hash/key columns vectorized in ``map_batches``,
  then ONE hash-partitioned ``groupby(key).map_groups(first)`` — the
  only shuffle, over (key, id) pairs.
- MinHash-LSH: per-batch shingle->signature->band keys (actor pool,
  hasher built once), explode to (band_key, doc_id) rows, groupby
  band_key -> candidate pairs, exact-Jaccard verify per pair, then
  min-label propagation for clusters. Nothing ever materializes the
  full corpus on one node; candidate pairs are the only driver-side
  small set.
- near-dup corpora for verification are synthesized deterministically
  (``with_mutated_copies``): every 10th doc gets a copy with id
  ``+ DUP_OFFSET`` and ~1/40 words rewritten, giving shingle Jaccard
  ~0.9. With 64 hashes in 16 bands x 4 rows, the per-pair miss
  probability is (1 - j^4)^16 ~ 2e-9 — deterministic in practice, so
  the SQL oracle can state the expected pairs exactly.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    MinHasher,
    TokenHasher,
    fnv1a64,
    hamming64,
    jaccard,
    simhash64,
)
from .textstats import TOKEN_RE

DUP_OFFSET = 10_000_000


def _p(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def mutate_text(t: str) -> str:
    """Every 40th word -> ``mutantN``. A pure function of the text, and
    deliberately SQL-expressible (string_split + indexed list_transform)
    so oracles can rebuild the mutated corpus."""
    words = t.split(" ")
    for k in range(0, len(words), 40):
        words[k] = f"mutant{k}"
    return " ".join(words)


def with_mutated_copies(batch: pa.Table) -> pa.Table:
    """documents batch -> batch + duplicate copies:

    - ``doc_id % 10 == 0``: NEAR-dup copy (mutate_text, shingle
      Jaccard ~0.9) with doc_id + DUP_OFFSET
    - ``doc_id % 10 == 5``: EXACT copy with doc_id + DUP_OFFSET
    """
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    add_ids, add_texts = [], []
    for i, t in zip(ids, texts):
        if i % 10 == 0:
            add_ids.append(i + DUP_OFFSET)
            add_texts.append(mutate_text(t))
        elif i % 10 == 5:
            add_ids.append(i + DUP_OFFSET)
            add_texts.append(t)
    return pa.table(
        {
            "doc_id": pa.array(ids + add_ids, type=pa.int64()),
            "text": pa.array(texts + add_texts, type=pa.string()),
        }
    )


def dup_corpus(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(with_mutated_copies, batch_format="pyarrow")


# -- exact dedup --


def exact_dedup_text(sf_dir: str):
    """Exact dedup by full text content over the dup corpus: keep the
    min doc_id per distinct text. Hash-partitioned groupby on a content
    hash (not the text itself) keeps shuffle payloads small."""
    ds = dup_corpus(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        h = [fnv1a64(x.encode()) - (1 << 63) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "text_hash": pa.array(h, type=pa.int64())}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [int(g["doc_id"].min())]})

    return hashed.groupby("text_hash").map_groups(first, batch_format="pandas")


def exact_dedup_key(sf_dir: str):
    """Exact dedup by a coarse key (lang, n_chars) over documents —
    real collisions exist in the corpus; keeps min doc_id per group."""
    import ray.data

    ds = ray.data.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_chars": [int(g["n_chars"].iloc[0])],
                "doc_id": [int(g["doc_id"].min())],
            }
        )

    return ds.groupby(["lang", "n_chars"]).map_groups(first, batch_format="pandas")


# -- MinHash + LSH --


N_SHUFFLE_BUCKETS = 64


class MinHashStage:
    """doc -> (bucket, band_key, doc_id) rows; hasher warm per actor.

    ``bucket`` coarsens the shuffle key: the downstream groupby
    co-locates ~(bands x docs / 64) rows per group and pair generation
    does a LOCAL pandas groupby per band inside each group — thousands
    of tiny distributed groups collapse into 64, which removes Ray's
    per-group dispatch overhead while producing identical pairs.
    """

    def __init__(self):
        self.word = re.compile(TOKEN_RE)
        self.hasher = MinHasher(k=64, bands=16)
        self.th = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        keys_out: list[int] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = self.hasher.signature(self.th.shingle_hashes(self.word.findall(text)))
            for key in self.hasher.band_keys(sig):
                ids_out.append(doc_id)
                keys_out.append(key - (1 << 63))
        keys = pa.array(keys_out, type=pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    [k % N_SHUFFLE_BUCKETS for k in keys_out], type=pa.int32()
                ),
                "band_key": keys,
                "doc_id": pa.array(ids_out, type=pa.int64()),
            }
        )


def _bucket_candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All within-band pairs for every band in one shuffle bucket."""
    a_out: list[int] = []
    b_out: list[int] = []
    for _, band in g.groupby("band_key"):
        ids = sorted(set(band["doc_id"].tolist()))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pd.DataFrame({"a": a_out, "b": b_out}).drop_duplicates()


class JaccardVerify:
    """Exact shingle-Jaccard verification of candidate pairs.

    Texts for pair members are fetched from a broadcast id->text store
    (ray.put once, ray.get in __init__) — a broadcast semi-join, no
    second shuffle. At 100 TB the store would be a sharded object-store
    lookup keyed by the same partitioning as the corpus; candidates are
    a vanishing fraction of rows, so the pattern holds."""

    def __init__(self, texts_ref, threshold: float):
        import ray

        self.texts: dict[int, str] = ray.get(texts_ref)
        self.threshold = threshold
        self.word = re.compile(TOKEN_RE)
        self.th = TokenHasher()
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, doc_id: int) -> np.ndarray:
        h = self._cache.get(doc_id)
        if h is None:
            h = np.sort(self.th.shingle_hashes(self.word.findall(self.texts[doc_id])))
            self._cache[doc_id] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        keep_a, keep_b, jac = [], [], []
        for a, b in zip(a_ids, b_ids):
            j = jaccard(self._sh(a), self._sh(b))
            if j >= self.threshold:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(j)
        return pa.table(
            {
                "a": pa.array(keep_a, type=pa.int64()),
                "b": pa.array(keep_b, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )


def minhash_dup_pairs(sf_dir: str, threshold: float = 0.5):
    """Verified near-dup pairs (a < b) over the dup corpus."""
    import ray

    ds = dup_corpus(sf_dir)
    banded = ds.map_batches(MinHashStage, batch_format="pyarrow", concurrency=(1, 4))
    cands = banded.groupby("bucket").map_groups(
        _bucket_candidate_pairs, batch_format="pandas"
    )

    # broadcast id->text for verification (documents are small per id;
    # at scale this is a sharded store, see JaccardVerify docstring)
    texts: dict[int, str] = {}
    for b in dup_corpus(sf_dir).iter_batches(batch_size=4096, batch_format="pyarrow"):
        texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    ref = ray.put(texts)

    verified = cands.map_batches(
        JaccardVerify,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_args=(ref, threshold),
    ).select_columns(["a", "b"])
    # a pair can surface from bands in different shuffle buckets: final
    # global dedup over the (tiny) verified set
    return verified.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def url_dedup(sf_dir: str):
    """Exact dedup by url over the pages table (SURVEY.md §2.6:
    defensive — WARC dumps repeat urls): keep the LATEST warc_ts per
    url, tie-broken deterministically. Duplicate rows are synthesized
    inline (every 7th doc re-crawled one hour later) so the winner set
    is oracle-stateable."""
    from ..sources.synth import read_pages

    pages = read_pages(sf_dir, columns=["url", "warc_ts"])

    def with_recrawls(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        add_u, add_t = [], []
        for u, s in zip(urls, ts):
            if int(u.rsplit("/", 1)[1]) % 7 == 0:
                add_u.append(u)
                add_t.append(s + 3_600_000_000)  # re-crawl 1h later
        return pa.table(
            {
                "url": pa.array(urls + add_u, pa.string()),
                "ts_us": pa.array(ts + add_t, pa.int64()),
            }
        )

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        winner = g["ts_us"].max()
        return pd.DataFrame(
            {
                "doc_id": [int(g["url"].iloc[0].rsplit("/", 1)[1])],
                "ts_us": [int(winner)],
            }
        )

    return (
        pages.map_batches(with_recrawls, batch_format="pyarrow")
        .groupby("url")
        .map_groups(latest, batch_format="pandas")
    )


def dedup_clusters(sf_dir: str, threshold: float = 0.999):
    """Connected components over verified duplicate pairs: (doc_id,
    cluster_id) for every document in a component of size > 1, with
    cluster_id = min doc_id of the component.

    The pair set is a vanishing fraction of the corpus (LSH + verify
    already ran), so components resolve with driver-side union-find —
    the guide's documented fallback for provably-small candidate sets;
    at larger pair volumes swap in iterative min-label propagation
    (groupby rounds) with the same output contract."""
    pairs = minhash_dup_pairs(sf_dir, threshold=threshold).take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["a"]), find(r["b"])
        if a != b:
            parent[max(a, b)] = min(a, b)

    rows = sorted((doc, find(doc)) for doc in parent)
    import pandas as pd

    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def simhash_fingerprints(sf_dir: str, max_hamming: int = 6):
    """SimHash near-dup pairs over the dup corpus: bucket by the four
    16-bit simhash bands (any pair within hamming<=6 shares at least
    one exact band with good probability; verified by hamming)."""
    import ray.data

    ds = dup_corpus(sf_dir)

    class SimHashStage:
        def __init__(self):
            self.word = re.compile(TOKEN_RE)
            self.th = TokenHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, bands, buckets, sims = [], [], [], []
            for doc_id, text in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            ):
                sh = simhash64(self.th.shingle_hashes(self.word.findall(text)))
                for band in range(4):
                    chunk = (sh >> (band * 16)) & 0xFFFF
                    key = band * 65536 + chunk
                    ids.append(doc_id)
                    bands.append(key)
                    buckets.append(key % N_SHUFFLE_BUCKETS)
                    sims.append(sh - (1 << 63))
            return pa.table(
                {
                    "bucket": pa.array(buckets, type=pa.int32()),
                    "band": pa.array(bands, type=pa.int64()),
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "simhash": pa.array(sims, type=pa.int64()),
                }
            )

    banded = ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=(1, 4))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, band in g.groupby("band"):
            rows = sorted(set(zip(band["doc_id"].tolist(), band["simhash"].tolist())))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if (
                        hamming64(
                            rows[i][1] + (1 << 63), rows[j][1] + (1 << 63)
                        )
                        <= max_hamming
                    ):
                        a_out.append(rows[i][0])
                        b_out.append(rows[j][0])
        return pd.DataFrame({"a": a_out, "b": b_out}).drop_duplicates()

    return (
        banded.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
