"""Magic-byte router + partitioner (SURVEY.md §2.2 V1, §3.4).

A stateless ``map_batches`` stage. Routing rule (deterministic,
documented; the PDF arm matches the reference header acceptance —
``%PDF-`` anywhere in the first 15 bytes, src/header.rs:30-54):

- ``pdf``   if ``%PDF-`` occurs in the first 15 bytes
- ``html``  if the first non-whitespace byte is ``<``
- ``other`` otherwise (incl. empty and NULL payloads — a corrupt row
  routes, it never raises; the error channel is downstream)

Also computes:
- ``partition_id`` = crc32(url) % num_partitions — the ONE partition
  key reused by every downstream stage (metrics groupby, partitioned
  output, resume; SURVEY.md §4). crc32 is stable across processes and
  languages, unlike Python's salted ``hash()``.
- ``nbytes`` = payload size (skew diagnostics / giant-row routing).

Fully Arrow/numpy-vectorized: the kind sniff runs as pyarrow compute
kernels over 15-byte prefix slices and the crc32 is a table-driven
numpy pass per byte position (functions/hashing.crc32_of_strings) —
no per-row Python on a stage that touches every row of the corpus.
``sniff_kind`` is kept as the scalar reference implementation the
vectorized path is tested against.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import crc32_of_strings

_WS = b"\t\n\x0c\r "


def sniff_kind(prefix: bytes | None) -> str:
    """Scalar reference router (None/empty -> 'other', never raises)."""
    if not prefix:
        return "other"
    if b"%PDF-" in prefix:
        return "pdf"
    stripped = prefix.lstrip(_WS)
    if stripped[:1] == b"<":
        return "html"
    return "other"


def sniff_kinds_vec(payloads: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized sniff over a binary column: kind per row."""
    prefix = pc.binary_slice(payloads, 0, 15)
    is_pdf = pc.match_substring(prefix, "%PDF-")
    # first non-[\t\n\f\r ] byte is '<'
    is_html = pc.match_substring_regex(prefix, r"^[\t\n\x0c\r ]*<")
    kind = pc.if_else(
        pc.fill_null(is_pdf, False),
        pa.scalar("pdf"),
        pc.if_else(pc.fill_null(is_html, False), pa.scalar("html"), pa.scalar("other")),
    )
    return kind


def make_router(num_partitions: int):
    """Returns a pyarrow map_batches fn adding kind/partition_id/nbytes."""

    def route_batch(batch: pa.Table) -> pa.Table:
        kinds = sniff_kinds_vec(batch["html"])
        pids = (crc32_of_strings(batch["url"]) % np.uint32(num_partitions)).astype(
            np.int32
        )
        nbytes = pc.fill_null(
            pc.binary_length(batch["html"]).cast(pa.int64()), 0
        )
        return (
            batch.append_column("kind", kinds)
            .append_column("partition_id", pa.array(pids, type=pa.int32()))
            .append_column("nbytes", nbytes)
        )

    return route_batch
