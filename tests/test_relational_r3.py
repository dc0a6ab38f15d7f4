"""Round-3 relational operators vs independent in-process references
(pandas recomputations over the raw parquet — the oracle SQL lives in
__ray_entry__ and is exercised by scripts/check_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_asof_join_matches_pandas_reference(ray_session):
    from pdf_parser_ray.pipelines.relational import events_asof_join

    got = (
        events_asof_join(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev[ev["event_type"].isin(["click", "view"])].copy()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    rows = []
    for _, g in ev.groupby("user_id"):
        last_view = None
        for _, r in g.iterrows():
            if r["event_type"] == "view":
                last_view = int(r["event_id"])
            elif last_view is not None:
                rows.append((int(r["event_id"]), last_view))
    exp = (
        pd.DataFrame(rows, columns=["event_id", "view_event_id"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_doc_size_ranges_covers_every_doc(ray_session):
    from pdf_parser_ray.pipelines.relational import SIZE_CLASSES, doc_size_ranges

    got = doc_size_ranges(SF).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert got["n_docs"].sum() == n_docs  # intervals tile: no doc lost/double
    chars = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"]).to_pandas()
    for name, lo, hi in SIZE_CLASSES:
        expected = int(((chars["n_chars"] >= lo) & (chars["n_chars"] < hi)).sum())
        row = got[got["size_class"] == name]
        assert (int(row["n_docs"].iloc[0]) if len(row) else 0) == expected


def test_top_docs_per_lang_pushdown_equals_global_sort(ray_session):
    from pdf_parser_ray.pipelines.relational import top_docs_per_lang

    got = top_docs_per_lang(SF).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    exp = (
        docs.sort_values(
            ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        .groupby("lang")
        .head(3)
    )
    for lang, g in exp.groupby("lang"):
        mine = got[got["lang"] == lang].sort_values("rank")
        assert list(mine["doc_id"]) == list(g["doc_id"])
        assert list(mine["rank"]) == list(range(1, len(g) + 1))


def test_chars_quantiles_rule(ray_session):
    import math

    from pdf_parser_ray.pipelines.relational import chars_quantiles

    got = chars_quantiles(SF).to_pandas()
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["lang", "n_chars"]
    ).to_pandas()
    for (lang, q), row in got.set_index(["lang", "q_pct"]).iterrows():
        vals = np.sort(docs.loc[docs["lang"] == lang, "n_chars"].to_numpy())
        idx = max(0, math.ceil(q / 100 * len(vals)) - 1)
        assert int(row["value"]) == int(vals[idx])


def test_bloom_no_false_negatives():
    from pdf_parser_ray.pipelines.relational import _bloom_set, _bloom_test

    keys = np.arange(0, 5000, dtype=np.int64) * 7919 + 3
    bits = _bloom_set(keys, 1 << 16, 4)
    # every inserted key MUST test positive (bloom guarantee)
    assert _bloom_test(keys, bits, 1 << 16, 4).all()
    # false-positive rate on disjoint keys stays near theory
    others = np.arange(1, 20000, dtype=np.int64) * 7919
    fp = _bloom_test(others, bits, 1 << 16, 4).mean()
    assert fp < 0.15  # theory ~0.024 at this load; generous bound


def test_bloom_semi_join_matches_duckdb(ray_session):
    import duckdb

    from pdf_parser_ray.pipelines.relational import bloom_semi_join

    sf = "/root/testdata/sf0.001"
    got = (
        bloom_semi_join(sf)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100+0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM '{sf}/lineitem.parquet'
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM '{sf}/orders.parquet'
          WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert list(got["l_returnflag"]) == list(exp["l_returnflag"])
    assert list(got["revenue_cents"]) == list(exp["revenue_cents"])
    assert list(got["n_rows"]) == list(exp["n_rows"])


def test_events_jsonl_roundtrip_agg(ray_session, tmp_path):
    """JSONL export -> read_json -> aggregate must equal the direct
    parquet aggregate (doubles round-trip exactly through JSON)."""
    import duckdb

    from pdf_parser_ray.pipelines.relational import events_jsonl_agg

    sf = "/root/testdata/sf0.001"
    got = (
        events_jsonl_agg(sf)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT event_type,
               CAST(SUM(CAST(FLOOR(value*100+0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM '{sf}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert list(got["event_type"]) == list(exp["event_type"])
    assert list(got["value_cents"]) == list(exp["value_cents"])
    assert list(got["n_events"]) == list(exp["n_events"])


def test_customers_no_orders_nonzero_anti_side(ray_session, tmp_path):
    """The testdata has no order-less customers, so pin the anti-join
    arithmetic on a corpus where it is nonzero."""
    from pdf_parser_ray.pipelines.relational import customers_no_orders

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_mktsegment": ["A", "A", "B", "B", "B"],
        }
    )
    orders = pa.table({"o_custkey": pa.array([1, 3, 3], pa.int64())})
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = (
        customers_no_orders(str(tmp_path))
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert list(got["c_mktsegment"]) == ["A", "B"]
    assert list(got["n_customers"]) == [2, 3]
    assert list(got["n_without_orders"]) == [1, 2]


def test_events_lag_delta_matches_window_sql(ray_session):
    import duckdb

    from pdf_parser_ray.pipelines.relational import events_lag_delta

    sf = "/root/testdata/sf0.001"
    got = (
        events_lag_delta(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT event_id,
               CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT)
                 AS prev_gap_us
        FROM '{sf}/events.parquet' ORDER BY event_id
        """
    ).df()
    assert list(got["prev_gap_us"]) == list(exp["prev_gap_us"])


def test_link_pagerank_matches_numpy_simulation(ray_session):
    from pdf_parser_ray.pipelines.relational import link_pagerank

    sf = "/root/testdata/sf0.001"
    got = (
        link_pagerank(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    n = len(got)
    r = np.full(n, 1_000_000, dtype=np.int64)
    for _ in range(3):
        s = np.zeros(n, dtype=np.int64)
        v = np.arange(n, dtype=np.int64)
        np.add.at(s, (v * 7 + 1) % n, r // 2)
        np.add.at(s, (v * 13 + 2) % n, r // 2)
        r = 150_000 + (85 * s) // 100
    assert list(got["rank_scaled"]) == list(r)
    assert list(got["doc_id"]) == list(range(n))


def test_embedding_clusters_seeds_self_assign(ray_session):
    from pdf_parser_ray.pipelines.similarity import embedding_clusters

    got = embedding_clusters("/root/testdata/sf0.001").to_pandas()
    seeds = got[(got["vec_id"] >= 8) & (got["vec_id"] < 24)]
    # a seed's nearest centroid is itself (cos = 1)
    assert (seeds["cluster_id"] == seeds["vec_id"]).all()
    assert set(got["cluster_id"]) <= set(range(8, 24))


def test_events_rolling_sum_short_users(ray_session, tmp_path):
    """Users with fewer events than the window use min_periods=1
    semantics (SQL ROWS BETWEEN 2 PRECEDING is the same)."""
    from pdf_parser_ray.pipelines.relational import events_rolling_sum

    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
            "ts": pa.array([100, 200, 300, 400, 100], pa.timestamp("us")),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    got = (
        events_rolling_sum(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # user 7: 100, 100+200, 100+200+400, 200+400+800; user 9: 1600
    assert list(got["rolling_cents"]) == [100, 300, 700, 1400, 1600]


def test_high_value_orders_expression_filter(ray_session):
    import duckdb

    from pdf_parser_ray.pipelines.relational import high_value_orders

    sf = "/root/testdata/sf0.001"
    got = high_value_orders(sf).to_pandas()
    exp = duckdb.sql(
        f"""SELECT CAST(COUNT(*) AS BIGINT) FROM '{sf}/orders.parquet'
            WHERE o_totalprice > 300000 AND o_orderstatus = 'O'"""
    ).fetchone()[0]
    assert got["n_orders"].sum() == exp


def test_link_pagerank_single_node_corpus(ray_session, tmp_path):
    """n=1: both formula edges are self-loops; rank converges to the
    damping fixpoint of r' = 150000 + (85*r)//100."""
    from pdf_parser_ray.pipelines.relational import link_pagerank

    docs = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": ["x"],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": pa.array([1], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = link_pagerank(str(tmp_path)).to_pandas()
    r = 1_000_000
    for _ in range(3):
        r = 150_000 + (85 * (2 * (r // 2))) // 100
    assert list(got["doc_id"]) == [0]
    assert list(got["rank_scaled"]) == [r]
