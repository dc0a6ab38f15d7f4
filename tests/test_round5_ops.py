"""Round-5 additions: exact Misra-Gries heavy hitters and SemDeDup
semantic dedup — small-corpus exactness plus invariants on the real
testdata tables."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_ray.pipelines import similarity, sketch

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))


def test_heavy_hitters_exact_tiny(ray_session, tmp_path):
    # 20 tokens total, k=4 -> heavy = freq*4 > 20 i.e. freq >= 6
    texts = ["aa " * 8 + "bb " * 5 + "cc", "dd ee ff gg hh jj"]
    _write_docs(tmp_path, texts)
    got = (
        sketch.heavy_hitters(str(tmp_path), k=4)
        .to_pandas()
        .set_index("token")["cnt"]
        .to_dict()
    )
    assert got == {"aa": 8}  # bb at 5*4=20 is NOT > 20 (strict)


def test_heavy_hitters_matches_exact_count_sf(ray_session):
    got = sketch.heavy_hitters(SF, k=100).to_pandas()
    word = re.compile(sketch.TOKEN_RE)
    cnt: Counter = Counter()
    for txt in pq.read_table(
        SF + "/documents.parquet", columns=["text"]
    )["text"].to_pylist():
        cnt.update(word.findall(txt))
    n = sum(cnt.values())
    exp = {t: c for t, c in cnt.items() if c * 100 > n}
    assert got.set_index("token")["cnt"].to_dict() == exp
    assert len(exp) > 0  # non-trivial on the real corpus


def test_heavy_hitters_partitioning_independent(ray_session):
    a = sketch.heavy_hitters(SF, k=100).to_pandas().sort_values("token")
    b = sketch.heavy_hitters(SF, k=2000).to_pandas().sort_values("token")
    # k=2000 keeps a superset of k=100's heavy set, with identical counts
    ad = a.set_index("token")["cnt"].to_dict()
    bd = b.set_index("token")["cnt"].to_dict()
    assert set(ad) <= set(bd)
    assert all(bd[t] == c for t, c in ad.items())


def test_semantic_dedup_flags_planted_copies(ray_session):
    got = similarity.semantic_dedup(SF).to_pandas()
    base = pq.read_table(SF + "/embeddings.parquet", columns=["vec_id"])
    n_base = len(base)
    n_copies = int(
        (base["vec_id"].to_numpy() % 10 == 0).sum()
    )
    assert len(got) == n_base + n_copies
    # every planted copy (vec_id >= DUP_OFFSET) sits at cos~0.9999 to
    # its source; if it shares the source's cluster it must be removed
    copies = got[got["vec_id"] >= similarity.DUP_OFFSET]
    srcs = got[got["vec_id"] < similarity.DUP_OFFSET].set_index("vec_id")
    same_cluster = [
        r.cluster_id == srcs.loc[r.vec_id - similarity.DUP_OFFSET, "cluster_id"]
        for r in copies.itertuples()
    ]
    assert all(
        (not same) or bool(r.removed)
        for same, r in zip(same_cluster, copies.itertuples())
    )
    # and the keeper of each group survives: sources with no lower-id
    # near-dup are never removed (copies have HIGHER ids by design)
    assert not srcs["removed"].all()
    # clusters match the seed-assignment rule of embedding_clusters on
    # the base rows
    ec = (
        similarity.embedding_clusters(SF)
        .to_pandas()
        .set_index("vec_id")["cluster_id"]
    )
    base_rows = got[got["vec_id"] < similarity.DUP_OFFSET]
    assert (
        base_rows.set_index("vec_id")["cluster_id"] == ec.loc[base_rows["vec_id"]]
    ).all()


def test_semantic_dedup_keep_lowest_id_rule(ray_session):
    got = similarity.semantic_dedup(SF).to_pandas()
    removed = got[got["removed"]]
    kept = got[~got["removed"]]
    # removal is strictly the EXISTS-lower-id rule: within a cluster the
    # minimum vec_id is always kept
    mins = got.groupby("cluster_id")["vec_id"].min()
    assert set(mins) <= set(kept["vec_id"])
    assert len(removed) > 0  # planted copies guarantee work to do


def _cms_cells(tokens, w=1024):
    from pdf_parser_ray.functions.hashing import fnv1a64_of_strings

    h = fnv1a64_of_strings(pa.array(tokens, pa.string()))
    c0 = (h % np.uint64(w)).astype(np.int64)
    h2 = ((h // np.uint64(w)) % np.uint64(w)).astype(np.int64)
    return c0, (c0 + h2) % w


def test_cms_exact_on_collision_free_corpus(ray_session):
    # 31 distinct tokens in 1024 cells: no collisions, so every CMS
    # estimate must equal the exact count
    got = (
        sketch.cms_token_counts(SF)
        .to_pandas()
        .set_index("token")["est_cnt"]
        .to_dict()
    )
    word = re.compile(sketch.TOKEN_RE)
    cnt: Counter = Counter()
    for txt in pq.read_table(
        SF + "/documents.parquet", columns=["text"]
    )["text"].to_pylist():
        cnt.update(word.findall(txt))
    assert got == dict(cnt)


def test_cms_overestimates_on_forced_collision(ray_session, tmp_path):
    # find two tokens colliding in BOTH rows (same c0 and same c1) by
    # deterministic search, then verify the classic CMS overestimate
    pool = [f"tok{i}" for i in range(300000)]
    c0, c1 = _cms_cells(pool)
    seen: dict = {}
    pair = None
    for t, a, b in zip(pool, c0, c1):
        key = (int(a), int(b))
        if key in seen:
            pair = (seen[key], t)
            break
        seen[key] = t
    assert pair is not None, "no double collision in search pool"
    t1, t2 = pair
    texts = [(t1 + " ") * 3 + (t2 + " ") * 5 + "solo"]
    _write_docs(tmp_path, texts)
    got = (
        sketch.cms_token_counts(str(tmp_path))
        .to_pandas()
        .set_index("token")["est_cnt"]
        .to_dict()
    )
    # colliding tokens report the merged cell count; the lone token
    # stays exact (its two cells are collision-free w.h.p. in this set)
    assert got[t1] == 8 and got[t2] == 8
    assert got["solo"] == 1
