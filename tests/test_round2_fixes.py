"""Round-2 hardening tests: vectorized router equivalence, truncated
Flate detection, resume parameter guard (ADVICE.md + VERDICT.md #6)."""

import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.functions.hashing import crc32_of_strings
from pdf_parser_ray.stages.route import make_router, sniff_kind, sniff_kinds_vec


@given(st.lists(st.text(max_size=80), max_size=50))
@settings(max_examples=200, deadline=None)
def test_crc32_vectorized_matches_zlib(strings):
    arr = pa.array(strings, type=pa.string())
    got = crc32_of_strings(arr)
    exp = np.array([zlib.crc32(s.encode("utf-8")) for s in strings], dtype=np.uint32)
    assert (got == exp).all()


@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)), max_size=60))
@settings(max_examples=200, deadline=None)
def test_sniff_vectorized_matches_scalar(payloads):
    arr = pa.array(payloads, type=pa.binary())
    got = sniff_kinds_vec(arr).to_pylist()
    exp = [sniff_kind((p or b"")[:15]) for p in payloads]
    assert got == exp


def test_router_null_payload_routes_other():
    t = pa.table(
        {
            "url": pa.array(["https://x/p/1", "https://x/p/2"]),
            "html": pa.array([None, b"%PDF-1.4"], type=pa.binary()),
        }
    )
    out = make_router(8)(t)
    assert out["kind"].to_pylist() == ["other", "pdf"]
    assert out["nbytes"].to_pylist() == [0, 8]


def test_flate_truncated_raises():
    from pdf_parser_ray.pdfcore.errors import FilterError
    from pdf_parser_ray.pdfcore.filters import flate_decode

    full = zlib.compress(b"A" * 10_000)
    assert flate_decode(full) == b"A" * 10_000
    with pytest.raises(FilterError, match="truncated"):
        flate_decode(full[: len(full) // 2])


def test_resume_param_mismatch_refused(ray_session, tmp_path):
    from pdf_parser_ray.pipelines.extract_pipeline import run_extract_job
    from pdf_parser_ray.sources.synth import build_pages_table

    pages_path = build_pages_table("/root/testdata/sf0.001")
    out_dir = str(tmp_path / "job")
    run_extract_job(pages_path, out_dir, num_units=2, num_partitions=8, concurrency=1)
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        run_extract_job(
            pages_path, out_dir, num_units=4, num_partitions=8, concurrency=1
        )
    # resume=False restarts cleanly with the new grid
    results = run_extract_job(
        pages_path,
        out_dir,
        num_units=4,
        num_partitions=8,
        concurrency=1,
        resume=False,
    )
    assert sum(r["rows"] for r in results) == 500


def test_cmap_cache_keys_are_bytes():
    """Cache must key by raw stream BYTES (collision-proof), not hash()."""
    from pdf_parser_ray.pdfcore.document import PdfDocument
    from pdf_parser_ray.pdfcore.pdfbuild import build_text_pdf
    from pdf_parser_ray.pdfcore.textextract import extract_text

    cache: dict = {}
    payload = build_text_pdf(b"cached text", show_variant="cmap")
    doc = PdfDocument(payload)
    text, _spans = extract_text(doc, cmap_cache=cache)
    assert text == b"cached text"
    assert cache and all(isinstance(k, bytes) for k in cache)


def test_minhash_batch_signatures_match_scalar():
    """signatures_batch must equal the per-doc signature path bit for
    bit (incl. the empty-set sentinel row)."""
    import re

    from pdf_parser_ray.functions.hashing import MinHasher, TokenHasher
    from pdf_parser_ray.pipelines.textstats import TOKEN_RE

    word = re.compile(TOKEN_RE)
    th = TokenHasher()
    mh = MinHasher(k=64, bands=16)
    texts = ["alpha beta gamma delta epsilon zeta", "one two three", "", "x"]
    sets = [th.shingle_hashes(word.findall(t)) for t in texts]
    sigs = mh.signatures_batch(sets)
    for i, s in enumerate(sets):
        assert (sigs[:, i] == mh.signature(s)).all()
    # identical signatures -> identical band keys (the LSH contract)
    keys = mh.band_keys_batch(np.stack([sigs[:, 0], sigs[:, 0]], axis=1))
    assert (keys[:, 0] == keys[:, 1]).all()


def test_label_propagation_chain_graph(ray_session):
    """A path graph (diameter 7) forces multiple propagation rounds —
    the corpus's near-clique dup clusters converge in 1-2, so this
    pins the loop logic itself. Expected: one component labeled by its
    min node."""
    import pandas as pd
    import ray.data

    from pdf_parser_ray.pipelines.dedup import (
        label_propagation_clusters,
        union_find_clusters,
    )

    edges = [(i, i + 1) for i in range(10, 17)] + [(30, 31), (40, 41), (40, 42)]
    pairs = ray.data.from_pandas(
        pd.DataFrame({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    )
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in label_propagation_clusters(pairs).take_all()
    )
    expected = sorted(
        (int(r["doc_id"]), int(r["cluster_id"]))
        for _, r in union_find_clusters(
            [{"a": a, "b": b} for a, b in edges]
        ).iterrows()
    )
    assert got == expected
    assert (16, 10) in got and (42, 40) in got


def test_auto_staging_at_high_unit_count(ray_session, tmp_path):
    """num_units >= 32 switches the hive-staged layout on
    automatically (fleet default); totals match the filter-scan path."""
    from pdf_parser_ray.pipelines.extract_pipeline import run_extract_job
    from pdf_parser_ray.sources.synth import build_pages_table

    pages = build_pages_table("/root/testdata/sf0.001")
    out = str(tmp_path / "auto")
    results = run_extract_job(
        pages, out, num_units=32, num_partitions=64, concurrency=1
    )
    assert sum(r["rows"] for r in results) == 500
    import glob

    staged = glob.glob(str(tmp_path / "auto_staging_*"))
    assert staged and any("unit_id=" in p for p in glob.glob(staged[0] + "/*"))


def test_stage_dir_grid_mismatch_refused(ray_session, tmp_path):
    """A staged layout is only valid for the grid that built it —
    reusing it under a different unit count would silently drop rows."""
    from pdf_parser_ray.pipelines.extract_pipeline import stage_pages
    from pdf_parser_ray.sources.synth import build_pages_table

    pages = build_pages_table("/root/testdata/sf0.001")
    staging = str(tmp_path / "st")
    stage_pages(pages, staging, num_partitions=64, num_units=8)
    # same grid: idempotent reuse
    stage_pages(pages, staging, num_partitions=64, num_units=8)
    with pytest.raises(ValueError, match="staging dir"):
        stage_pages(pages, staging, num_partitions=64, num_units=4)


def test_label_propagation_empty_pairs(ray_session):
    """Zero verified pairs must yield an empty cluster set, not a
    TypeError from Ray's None-on-empty aggregate."""
    import pandas as pd
    import ray.data

    from pdf_parser_ray.pipelines.dedup import label_propagation_clusters

    pairs = ray.data.from_pandas(
        pd.DataFrame({"a": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64")})
    )
    assert label_propagation_clusters(pairs).count() == 0
