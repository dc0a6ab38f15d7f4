"""Round-4 operator additions: histogram quantile sketch, per-group
hash-rank bottom-k sampling, bounded inverted-index postings.

Hand-built tiny tables pin the exact semantics (bin edges, rank ties,
posting caps); the sf0.001 oracle run covers the corpus-scale path.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_ray.functions.hashing import fnv1a64
from pdf_parser_ray.pipelines import sketch, textstats, training


def _write_docs(tmp_path, rows):
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["t"] * len(rows),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_quantile_sketch_hand_case(ray_session, tmp_path):
    # en: n_chars 10, 70, 130 -> bins 0, 1, 2; n=3
    # p50 rank=(50*3+99)//100=2 -> bin 1 -> est_hi 127
    # p90 rank=(90*3+99)//100=3 -> bin 2 -> est_hi 191
    # de: single value 200 -> bin 3 -> est_hi 255 for both quantiles
    sf = _write_docs(
        tmp_path,
        [(0, "x", "en", 10), (1, "x", "en", 70), (2, "x", "en", 130),
         (3, "x", "de", 200)],
    )
    got = sketch.quantile_sketch(sf).to_pandas()
    got = got.set_index(["lang", "q_pct"]).sort_index()
    assert got.loc[("en", 50), "est_hi"] == 127
    assert got.loc[("en", 90), "est_hi"] == 191
    assert got.loc[("en", 50), "n"] == 3
    assert got.loc[("de", 50), "est_hi"] == 255
    assert got.loc[("de", 90), "est_hi"] == 255


def test_quantile_sketch_brackets_exact(ray_session):
    """On the real corpus the sketch upper edge must bracket the exact
    discrete quantile from above, within one bin width. Uses the
    sketch's own INTEGER rank rule (q*n+99)//100 — deliberately not
    float math.ceil, which differs at ranks like ceil(0.9*10)."""
    sf = "/root/testdata/sf0.001"
    got = sketch.quantile_sketch(sf).to_pandas().set_index(["lang", "q_pct"])
    t = pq.read_table(sf + "/documents.parquet", columns=["lang", "n_chars"])
    df = t.to_pandas()
    for (lang, q), row in got.iterrows():
        vals = np.sort(df[df["lang"] == lang]["n_chars"].to_numpy())
        rank = (int(q) * len(vals) + 99) // 100  # 1-based integer ceil
        exact = int(vals[max(0, rank - 1)])
        assert exact <= row["est_hi"] < exact + 64, (lang, q, exact, row["est_hi"])


def test_bottomk_sample_hand_case(ray_session, tmp_path):
    # verify the selected ids are exactly the k smallest FNV hashes
    rows = [(i, "x", "en" if i % 2 == 0 else "de", 5) for i in range(40)]
    sf = _write_docs(tmp_path, rows)
    got = training.bottomk_sample_per_lang(sf, k=3).to_pandas()
    for lang, ids in (
        ("en", [i for i in range(40) if i % 2 == 0]),
        ("de", [i for i in range(40) if i % 2 == 1]),
    ):
        expect = sorted(ids, key=lambda i: (fnv1a64(str(i).encode()), i))[:3]
        sel = got[got["lang"] == lang].sort_values("rank")
        assert sel["doc_id"].tolist() == expect
        assert sel["rank"].tolist() == [1, 2, 3]


def test_bottomk_sample_budget_and_determinism(ray_session):
    sf = "/root/testdata/sf0.001"
    a = training.bottomk_sample_per_lang(sf).to_pandas()
    b = training.bottomk_sample_per_lang(sf).to_pandas()
    key = ["lang", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    # fixed budget: exactly min(k, group size) per lang
    assert (a.groupby("lang").size() <= 16).all()


def test_term_postings_hand_case(ray_session, tmp_path):
    rows = [
        (5, "spark and vector", "en", 10),
        (1, "vector only here", "en", 10),
        (9, "vectorize is NOT a hit", "en", 10),  # substring miss
        (3, "spark", "de", 5),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        textstats.term_postings(sf, terms=("vector", "spark"), cap=20)
        .to_pandas()
        .set_index("term")
    )
    assert got.loc["vector", "n_docs"] == 2  # doc 9's 'vectorize' excluded
    assert got.loc["vector", "postings"] == "1,5"
    assert got.loc["spark", "n_docs"] == 2
    assert got.loc["spark", "postings"] == "3,5"


def test_term_postings_cap(ray_session, tmp_path):
    rows = [(i, "hash", "en", 4) for i in range(30)]
    sf = _write_docs(tmp_path, rows)
    got = textstats.term_postings(sf, terms=("hash",), cap=5).to_pandas()
    assert got.loc[0, "n_docs"] == 30  # exact count survives the cap
    assert got.loc[0, "postings"] == "0,1,2,3,4"


def test_near_dedup_survivors_consistent_with_pairs(ray_session):
    from pdf_parser_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    surv = set(
        dedup.near_dedup_survivors(sf).to_pandas()["doc_id"].tolist()
    )
    pairs = dedup.minhash_dup_pairs(sf, threshold=0.5).to_pandas()
    corpus = set(dedup.dup_corpus(sf).to_pandas()["doc_id"].tolist())
    removed = set(pairs["b"].tolist())
    assert surv == corpus - removed
    # keep-smallest rule: the smaller member of every pair survives
    # unless it is itself the larger member of another pair
    assert removed.isdisjoint(surv)
    assert len(surv) < len(corpus)  # the dup corpus always has dups


def test_quality_classifier_hand_case(ray_session, tmp_path):
    from pdf_parser_ray.pipelines.textstats import (
        QC_THRESHOLD,
        quality_classifier_score,
    )

    # doc 0: "the cat." -> chars=8, tokens=2, stop=1, punct=1
    #   score = 8 + 40 + 50 - 30 = 68 -> kept=0
    # doc 1: long enough to clear the threshold
    rows = [
        (0, "the cat.", "en", 8),
        (1, "the " * 40 + "x", "en", 161),
    ]
    sf = _write_docs(tmp_path, rows)
    got = quality_classifier_score(sf).to_pandas().set_index("doc_id")
    assert got.loc[0, "score"] == 68
    assert got.loc[0, "kept"] == 0
    # doc 1: chars=161, tokens=41, stop=40, punct=0 -> 161+820+2000=2981
    assert got.loc[1, "score"] == 2981
    assert got.loc[1, "kept"] == int(2981 >= QC_THRESHOLD)


def test_url_dedup_windowed_semantics(ray_session):
    from pdf_parser_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    got = dedup.url_dedup_windowed(sf).to_pandas()
    per_doc = got.groupby("doc_id").size()
    # every 11th doc re-crawls 72h later -> lands in a LATER 48h window
    # and must survive as a second row; everyone else collapses to one
    assert (per_doc[per_doc.index % 11 == 0] == 2).all()
    assert (per_doc[per_doc.index % 11 != 0] == 1).all()
    # the 1h re-crawl (every 7th doc) stays in-window: its LATER ts wins
    base = 1704067200000000
    row = got[(got["doc_id"] == 7)].sort_values("window_id").iloc[0]
    assert row["ts_us"] == base + 7 * 1_000_000 + 3_600_000_000
