"""Round-5 additions #2: interval (band) join, HyperLogLog distinct
shingles, and distributed set operations — tiny-corpus exactness plus
invariants against pure-Python recomputation on the real testdata."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_ray.functions.hashing import shingle_hashes
from pdf_parser_ray.pipelines import relational, sketch, textstats

SF = "/root/testdata/sf0.001"
_US = 1_000_000


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, event_type, ts_seconds)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [r[3] * _US for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))


def test_interval_join_window_bounds_tiny(ray_session, tmp_path):
    h = 3600
    _write_events(
        tmp_path,
        [
            (1, 7, "purchase", 1000),
            (2, 7, "click", 1000),          # ts == p.ts: strict > excludes
            (3, 7, "click", 1001),          # inside
            (4, 7, "click", 1000 + 6 * h),  # exactly p.ts + 6h: included (<=)
            (5, 7, "click", 1001 + 6 * h),  # one past the window
            (6, 8, "click", 1001),          # other user: never matches
            (7, 9, "purchase", 500),        # purchase with no clicks
            (8, 7, "view", 1001),           # other type: ignored
        ],
    )
    got = relational.events_interval_join(str(tmp_path)).to_pandas()
    pairs = set(zip(got["purchase_event_id"], got["click_event_id"]))
    assert pairs == {(1, 3), (1, 4)}


def test_interval_join_all_pairs_not_just_nearest(ray_session, tmp_path):
    _write_events(
        tmp_path,
        [(1, 5, "purchase", 0)]
        + [(10 + i, 5, "click", 60 * (i + 1)) for i in range(5)],
    )
    got = relational.events_interval_join(str(tmp_path)).to_pandas()
    assert sorted(got["click_event_id"]) == [10, 11, 12, 13, 14]


def test_interval_join_matches_bruteforce_sf(ray_session):
    got = relational.events_interval_join(SF).to_pandas()
    ev = pq.read_table(
        SF + "/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    ).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    p = ev[ev.event_type == "purchase"]
    c = ev[ev.event_type == "click"]
    m = p.merge(c, on="user_id", suffixes=("_p", "_c"))
    m = m[(m.tu_c > m.tu_p) & (m.tu_c <= m.tu_p + 6 * 3600 * _US)]
    exp = set(zip(m["event_id_p"], m["event_id_c"]))
    assert set(zip(got["purchase_event_id"], got["click_event_id"])) == exp
    assert len(exp) > 0  # non-trivial on the real table


def _py_hll(sf_dir):
    """Pure-Python register + finalize reference (same integer rules)."""
    word = re.compile(sketch.TOKEN_RE)
    docs = pq.read_table(sf_dir + "/documents.parquet", columns=["lang", "text"])
    regs: dict[str, dict[int, int]] = {}
    m = sketch._HLL_M
    for lang, text in zip(docs["lang"].to_pylist(), docs["text"].to_pylist()):
        for h in shingle_hashes(word.findall(text)).tolist():
            b, w = h % m, h // m
            rho = sketch._HLL_RHO_MAX if w == 0 else (w & -w).bit_length()
            r = regs.setdefault(lang, {})
            if r.get(b, 0) < rho:
                r[b] = rho
    out = {}
    for lang, r in regs.items():
        s = sum(sketch._HLL_SCALE >> rho for rho in r.values())
        s += (m - len(r)) * sketch._HLL_SCALE
        est = (
            sketch._HLL_ALPHA_NUM * m * m * sketch._HLL_SCALE
            // (sketch._HLL_ALPHA_DEN * s)
        )
        out[lang] = (len(r), max(r.values()), est)
    return out


def test_hll_matches_python_reference(ray_session):
    got = sketch.hll_distinct_shingles(SF).to_pandas()
    exp = _py_hll(SF)
    assert len(got) == len(exp)
    for row in got.itertuples():
        assert (row.used_regs, row.max_rho, row.est_raw) == exp[row.lang]


def test_hll_estimate_accuracy(ray_session):
    got = sketch.hll_distinct_shingles(SF).to_pandas()
    word = re.compile(sketch.TOKEN_RE)
    docs = pq.read_table(SF + "/documents.parquet", columns=["lang", "text"])
    true: dict[str, set] = {}
    for lang, text in zip(docs["lang"].to_pylist(), docs["text"].to_pylist()):
        true.setdefault(lang, set()).update(
            shingle_hashes(word.findall(text)).tolist()
        )
    for row in got.itertuples():
        n = len(true[row.lang])
        # raw HLL at m=1024 has ~3.25% stderr; allow 5 sigma
        assert abs(row.est_raw - n) <= max(0.17 * n, 5)


def test_shingle_set_ops_tiny(ray_session, tmp_path):
    texts = ["x y z w", "a b c"]
    langs = ["en", "de"]
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": texts,
            "lang": langs,
            "source": ["t", "t"],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = textstats.shingle_set_ops(str(tmp_path)).to_pandas()
    d = dict(zip(got["shingle"], got["set_op"]))
    assert d == {
        "x y z": "only_a",
        "y z w": "only_a",
        "a b c": "only_b",
    }


def test_shingle_set_ops_decomposition_sf(ray_session):
    got = textstats.shingle_set_ops(SF).to_pandas()
    word = re.compile(r"[A-Za-z0-9]+")
    docs = pq.read_table(SF + "/documents.parquet", columns=["lang", "text"])
    sets = {"en": set(), "de": set()}
    for lang, text in zip(docs["lang"].to_pylist(), docs["text"].to_pylist()):
        if lang not in sets:
            continue
        toks = word.findall(text)
        if not toks:
            continue
        if len(toks) < 3:
            sets[lang].add(" ".join(toks))
        else:
            sets[lang].update(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
    by_op = {
        op: set(g["shingle"]) for op, g in got.groupby("set_op")
    }
    assert by_op.get("intersect", set()) == sets["en"] & sets["de"]
    assert by_op.get("only_a", set()) == sets["en"] - sets["de"]
    assert by_op.get("only_b", set()) == sets["de"] - sets["en"]
    assert len(got) == len(sets["en"] | sets["de"])


def test_revenue_by_priority_matches_bruteforce(ray_session):
    got = (
        relational.revenue_by_priority(SF)
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    li = pq.read_table(SF + "/lineitem.parquet").to_pandas()
    od = pq.read_table(SF + "/orders.parquet").to_pandas()
    li["rev"] = np.floor(
        li["l_extendedprice"] * (1.0 - li["l_discount"]) * 100.0 + 0.5
    ).astype("int64")
    per_order = li.groupby("l_orderkey", as_index=False)["rev"].sum()
    m = per_order.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    exp = (
        m.groupby("o_orderpriority")
        .agg(n_orders=("o_orderkey", "size"), revenue_cents=("rev", "sum"))
        .reset_index()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_orders"].tolist() == exp["n_orders"].tolist()
    assert got["revenue_cents"].tolist() == exp["revenue_cents"].tolist()


def test_funnel_strict_order_tiny(ray_session, tmp_path):
    # user 1 completes the funnel in order; user 2 has all three event
    # types but out of order (purchase before click); user 3 stops at
    # click; user 4 views twice (anchor = earliest view)
    _write_events(
        tmp_path,
        [
            (1, 1, "view", 100), (2, 1, "click", 200), (3, 1, "purchase", 300),
            (4, 2, "view", 100), (5, 2, "purchase", 150), (6, 2, "click", 200),
            (7, 3, "view", 100), (8, 3, "click", 150),
            (9, 4, "view", 500), (10, 4, "view", 100),
        ],
    )
    got = (
        relational.funnel_counts(str(tmp_path))
        .to_pandas()
        .sort_values("stage_idx")
    )
    assert got["n_users"].tolist() == [4, 3, 1]


def test_funnel_same_ts_excluded_tiny(ray_session, tmp_path):
    # click at exactly the view's ts does not advance (strict >)
    _write_events(
        tmp_path,
        [(1, 1, "view", 100), (2, 1, "click", 100), (3, 1, "purchase", 200)],
    )
    got = (
        relational.funnel_counts(str(tmp_path))
        .to_pandas()
        .sort_values("stage_idx")
    )
    assert got["n_users"].tolist() == [1, 0, 0]
