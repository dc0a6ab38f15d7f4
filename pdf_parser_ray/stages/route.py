"""Magic-byte router + partitioner (SURVEY.md §2.2 V1, §3.4).

A stateless ``map_batches`` stage. Routing rule (deterministic,
documented; the PDF arm matches the reference header acceptance —
``%PDF-`` anywhere in the first 15 bytes, src/header.rs:30-54):

- ``pdf``   if ``%PDF-`` occurs in the first 15 bytes
- ``html``  if the first non-whitespace byte is ``<``
- ``other`` otherwise (incl. empty payloads)

Also computes:
- ``partition_id`` = crc32(url) % num_partitions — the ONE partition
  key reused by every downstream stage (metrics groupby, partitioned
  output, resume; SURVEY.md §4). crc32 is stable across processes and
  languages, unlike Python's salted ``hash()``.
- ``nbytes`` = payload size (skew diagnostics / giant-row routing).

Only 15-byte prefixes are materialized per row; payload columns are
untouched (zero-copy pass-through of the Arrow block).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

_WS = b"\t\n\x0c\r "


def sniff_kind(prefix: bytes) -> str:
    if b"%PDF-" in prefix:
        return "pdf"
    stripped = prefix.lstrip(_WS)
    if stripped[:1] == b"<":
        return "html"
    return "other"


def make_router(num_partitions: int):
    """Returns a pyarrow map_batches fn adding kind/partition_id/nbytes."""

    def route_batch(batch: pa.Table) -> pa.Table:
        prefixes = pc.binary_slice(batch["html"], 0, 15).to_pylist()
        kinds = [sniff_kind(p) for p in prefixes]
        urls = batch["url"].to_pylist()
        pids = [zlib.crc32(u.encode("utf-8")) % num_partitions for u in urls]
        nbytes = pc.binary_length(batch["html"]).cast(pa.int64())
        return (
            batch.append_column("kind", pa.array(kinds, type=pa.string()))
            .append_column("partition_id", pa.array(pids, type=pa.int32()))
            .append_column("nbytes", nbytes)
        )

    return route_batch
