"""Raw-file source: a directory of .pdf/.html/.bin files -> the
input_hint pages table shape.

For corpora that arrive as loose files rather than Parquet (e.g. a
crawler's spool directory), ``read_binary_dir`` uses Ray Data's
``read_binary_files`` (streaming, one block per file group) and maps
each file to a ``(url, warc_ts, html, text, lang)`` row, so every
downstream stage — router, extractor, dedup — runs unchanged.

At 100 TB the parquet path is preferred (column pruning, row groups);
this source exists for ingest/edge cases and capability parity.
"""

from __future__ import annotations

import pyarrow as pa


def read_binary_dir(path: str, default_lang: str = ""):
    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_pages(batch: dict) -> pa.Table:
        paths = [str(p) for p in batch["path"]]
        payloads = [bytes(b) for b in batch["bytes"]]
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths], pa.string()),
                "warc_ts": pa.array([0] * len(paths), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(paths), pa.string()),
                "lang": pa.array([default_lang] * len(paths), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="numpy")
