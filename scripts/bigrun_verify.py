"""Million-document byte-identity run (BASELINE.md evidence).

Tiles the sf0.1 corpus ``--repeat`` x (2M docs at x400, all
representation variants incl. the v8 DCTDecode image rows), streams it
through the headline pipeline, and verifies IN-PIPELINE that every ok
row's extracted text is byte-identical to the expected text — expected
is a pure function of doc_id (the tiled documents table; 5k base texts
broadcast once via ray.put, ~3 MB). Nothing materializes on the
driver; the verdict is a tiny aggregate.

Usage: python scripts/bigrun_verify.py [--repeat 400] [--num-cpus 32]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=400)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext
    from ray.data.aggregate import Sum

    DataContext.get_current().enable_progress_bars = False

    from pdf_parser_ray.pipelines.extract_pipeline import build_extract_ds
    from pdf_parser_ray.sources.synth import build_pages_table

    # untimed: corpus cache + broadcast expected texts (5k base docs)
    pages_path = build_pages_table(SF, repeat=args.repeat)
    base = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    n_base = base.num_rows
    expected = [None] * n_base
    for i, t in zip(base["doc_id"].to_pylist(), base["text"].to_pylist()):
        expected[i] = t.encode("utf-8")
    ref = ray.put(expected)

    class Verify:
        """ok rows: text must equal expected[doc_id % n_base]; junk
        rows must be error rows. Emits one partial count row."""

        def __init__(self, ref, n_base):
            self.expected = ray.get(ref)
            self.n_base = n_base

        def __call__(self, batch: pa.Table) -> pa.Table:
            tiled = [int(u.rsplit("/", 1)[1]) for u in batch["url"].to_pylist()]
            oks = batch["ok"].to_pylist()
            texts = batch["text"].to_pylist()
            n_checked = n_bad = 0
            for tid, ok, t in zip(tiled, oks, texts):
                # the payload arm is a function of the TILED id; the
                # text is the base document's (tiling shifts ids only)
                if tid % 3 == 2:
                    n_bad += ok  # junk must NOT extract
                    continue
                n_checked += 1
                if not ok or bytes(t) != self.expected[tid % self.n_base]:
                    n_bad += 1
            return pa.table(
                {
                    "rows": pa.array([len(batch)], pa.int64()),
                    "checked": pa.array([n_checked], pa.int64()),
                    "mismatches": pa.array([n_bad], pa.int64()),
                }
            )

    ds = build_extract_ds(
        ray.data.read_parquet(pages_path), batch_size=256
    )
    t0 = time.monotonic()
    verdict = (
        ds.map_batches(
            Verify,
            batch_format="pyarrow",
            concurrency=(2, 4),
            fn_constructor_args=(ref, n_base),
        )
        .aggregate(
            Sum("rows", alias_name="rows"),
            Sum("checked", alias_name="checked"),
            Sum("mismatches", alias_name="mismatches"),
        )
    )
    dt = time.monotonic() - t0
    out = {
        "docs": int(verdict["rows"]),
        "checked": int(verdict["checked"]),
        "mismatches": int(verdict["mismatches"]),
        "wall_sec": round(dt, 1),
        "docs_per_sec": round(verdict["rows"] / dt, 1),
        "num_cpus": args.num_cpus,
        "repeat": args.repeat,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
