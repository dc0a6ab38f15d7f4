"""KMV distinct-count sketch: vectorized FNV hash equivalence, exact
small-cardinality behavior, and estimator accuracy on real corpus data."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.functions.hashing import fnv1a64, fnv1a64_of_strings
from pdf_parser_ray.pipelines import sketch

SF = "/root/testdata/sf0.001"


@given(st.lists(st.text(max_size=40), max_size=60))
@settings(max_examples=200, deadline=None)
def test_fnv_vectorized_matches_scalar(strings):
    arr = pa.array(strings, type=pa.string())
    got = fnv1a64_of_strings(arr)
    exp = np.array([fnv1a64(s.encode("utf-8")) for s in strings], dtype=np.uint64)
    assert (got == exp).all()


def test_kmv_exact_below_k(ray_session, tmp_path):
    import pyarrow.parquet as pq

    # 2 langs, tiny vocab << k: estimate must be the EXACT distinct count
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a b c a", "c d", "x y z"],
            "lang": ["en", "en", "de"],
            "source": ["t"] * 3,
            "n_chars": pa.array([7, 3, 5], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        sketch.kmv_distinct_tokens(str(tmp_path))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert got.loc["en", "est_distinct"] == 4  # a b c d
    assert got.loc["en", "n_kept"] == 4
    assert got.loc["de", "est_distinct"] == 3  # x y z
    assert (got["k"] == 128).all()


def test_kmv_estimator_accuracy_sf(ray_session):
    """On the real corpus (vocab >> k) the KMV estimate must land
    within the standard ~1/sqrt(k) relative-error band (x3 slack)."""
    import re

    import pyarrow.parquet as pq

    got = sketch.kmv_distinct_tokens(SF).to_pandas().set_index("lang")
    t = pq.read_table(SF + "/documents.parquet", columns=["lang", "text"])
    word_re = re.compile(sketch.TOKEN_RE)
    exact = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        exact.setdefault(lang, set()).update(word_re.findall(text))
    for lang, words in exact.items():
        est = got.loc[lang, "est_distinct"]
        n = len(words)
        if n < 128:
            assert est == n
        else:
            assert abs(est - n) / n < 3.0 / np.sqrt(128)
