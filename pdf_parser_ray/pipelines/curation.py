"""The flagship COMPOSITE pipeline: what a training-data user actually
runs end to end — extraction feeding quality filtering feeding
deduplication, all streaming, one Ray Data plan per phase.

    pages -> route -> extract (actor pool)          # extraction
          -> vectorized token stats -> filter       # quality gate
          -> 128-bit content key -> groupby Min     # exact dedup
          -> clean corpus rows

Every stage is an Arrow-vectorized ``map_batches`` or a native
aggregate; the only shuffle is the final dedup groupby over
(key, doc_id, n_tokens) rows — never the text. Fully oracle-checked
(the ``curation_pipeline`` query): the SQL restates extraction arms,
the token-count filter and the keep-min-doc_id-per-distinct-text rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import blake2b128_of_strings

TOKEN_RE = r"[A-Za-z0-9]+"
DEFAULT_MIN_TOKENS = 30


def curation_pipeline(sf_dir: str, min_tokens: int = DEFAULT_MIN_TOKENS):
    """Returns (doc_id, n_tokens) for the deduplicated, quality-passing
    extracted corpus: ok rows with >= min_tokens tokens, one winner
    (min doc_id) per distinct extracted text."""
    from ray.data.aggregate import Min

    from ..pipelines.extract_pipeline import build_extract_ds
    from ..sources.synth import read_pages

    extracted = build_extract_ds(read_pages(sf_dir))

    def quality_gate(t: pa.Table) -> pa.Table:
        t = t.filter(t["ok"])
        texts = t["text"].cast(pa.large_string()).cast(pa.string())
        n_tokens = pc.count_substring_regex(texts, TOKEN_RE).cast(pa.int64())
        keep = pc.greater_equal(n_tokens, pa.scalar(min_tokens, pa.int64()))
        doc_ids = pa.array(
            [int(u.rsplit("/", 1)[1]) for u in t["url"].to_pylist()],
            type=pa.int64(),
        )
        # 128-bit content key as two int64 columns (64 bits would
        # birthday-collide around 4e9 rows; see dedup.exact_dedup_text),
        # hashed from zero-copy buffer views — no pylist round-trip
        h1, h2 = blake2b128_of_strings(t["text"])
        out = pa.table(
            {
                "doc_id": doc_ids,
                "n_tokens": n_tokens,
                "h1": pa.array(h1, pa.int64()),
                "h2": pa.array(h2, pa.int64()),
            }
        )
        return out.filter(keep)

    return (
        extracted.map_batches(quality_gate, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(
            Min("doc_id", alias_name="doc_id"),
            Min("n_tokens", alias_name="n_tokens"),
        )
        .select_columns(["doc_id", "n_tokens"])
    )
