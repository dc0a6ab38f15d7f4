"""Registry guard: the driver contract's queries()/oracle_sql() stay
importable, consistently keyed, and a representative subset executes at
smoke scale (the full 36-query oracle comparison lives in
scripts/check_oracle.py; this is the fast in-suite canary)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as e

    return e


def test_registry_shape(contract):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_oracle_sql_parses(contract):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in contract.oracle_sql().items():
        con.sql(sql)  # raises on any syntax/semantic error


@pytest.mark.parametrize(
    "name,min_rows",
    [
        ("route_counts", 3),
        ("extract_pdf_text", 100),
        ("lineitem_agg", 1),
        ("minhash_exact_pairs", 50),
        ("ann_topk", 40),
    ],
)
def test_representative_queries_run(ray_session, contract, name, min_rows):
    result = contract.queries()[name](SF)
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    assert len(df) >= min_rows


def test_entry_smoke(ray_session, contract):
    ds = contract.entry()
    assert ds.count() == 500
    assert "text" in ds.schema().names
