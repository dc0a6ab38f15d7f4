"""The flagship pipeline: pages table -> extracted text (SURVEY.md §3.4).

    read_parquet(pages)
      -> map_batches(route)                 # stateless tasks: kind sniff,
                                            #   partition_id, nbytes
      -> map_batches(Extractor, actors)     # warm CMap caches per actor
      [-> write_parquet(out/unit=K/...)]    # atomic per-unit output
      [-> groupby metrics -> manifest]

The hot path is shuffle-free: the only groupby is over the tiny
per-partition metrics table. Resumable runs process the input in
units (slices of the partition-id space); see state/manifest.py.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import Extractor
from ..stages.route import make_router
from ..state import manifest as mf

DEFAULT_NUM_PARTITIONS = 256


def default_concurrency() -> tuple[int, int]:
    """Actor-pool size leaving headroom for the read/route/write stages."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    hi = max(2, cpus - 2)
    return (max(1, hi // 2), hi)


def build_extract_ds(
    pages_ds,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    concurrency=None,
    batch_size: int = 64,
    repartition_blocks: int | None = None,
):
    """Lazy extraction Dataset over a pages Dataset (no consumption).

    ``repartition_blocks``: explicit pre-route repartition (north_rule:
    "read_parquet with explicit repartitioning to bound skew"). Splits
    or coalesces blocks WITHOUT a shuffle so a handful of giant input
    files can't serialize the pipeline; Ray's dynamic block splitting
    plus the giant-row lane handle per-row skew beyond that.
    """
    if repartition_blocks is not None:
        pages_ds = pages_ds.repartition(repartition_blocks)
    ds = pages_ds.map_batches(
        make_router(num_partitions), batch_format="pyarrow"
    )
    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        Extractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def partition_metrics(extracted_ds):
    """Per-partition lineage metrics — the only shuffle in the pipeline,
    over one small row per (partition, batch) partial (SURVEY.md §2.6)."""

    def partial(batch: pa.Table) -> pa.Table:
        ok_int = batch["ok"].cast(pa.int64())
        t = pa.table(
            {
                "partition_id": batch["partition_id"],
                "rows": pa.array([1] * len(batch), pa.int64()),
                "ok_rows": ok_int,
                "bytes_in": batch["nbytes"],
                "text_bytes": pc.binary_length(batch["text"]).cast(pa.int64()),
            }
        )
        return t.group_by("partition_id").aggregate(
            [("rows", "sum"), ("ok_rows", "sum"), ("bytes_in", "sum"), ("text_bytes", "sum")]
        ).rename_columns(["partition_id", "rows", "ok_rows", "bytes_in", "text_bytes"])

    from ray.data.aggregate import Sum

    partials = extracted_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("partition_id").aggregate(
        Sum("rows", alias_name="rows"),
        Sum("ok_rows", alias_name="ok_rows"),
        Sum("bytes_in", alias_name="bytes_in"),
        Sum("text_bytes", alias_name="text_bytes"),
    )


def _input_fingerprint(path: str) -> str:
    """Cheap content identity for an input path (total size + max
    mtime over parquet files): regenerated input at the SAME path must
    not silently reuse a stale staged layout."""
    total = 0
    mtime = 0.0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(root, f))
                    total += st.st_size
                    mtime = max(mtime, st.st_mtime)
    elif os.path.exists(path):
        st = os.stat(path)
        total, mtime = st.st_size, st.st_mtime
    return f"{total}:{int(mtime)}"


def stage_pages(
    pages_path: str,
    staging_dir: str,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    num_units: int = 8,
) -> str:
    """Route the input ONCE and write it hive-partitioned by resume
    unit (``unit_id=K/``), so each unit sub-job reads only its own
    files — the fleet-scale layout from DESIGN.md "Unit reads", which
    removes the per-unit full-input re-read. Idempotent (atomic commit
    + _SUCCESS marker)."""
    import json

    import ray.data

    grid = {
        "pages_path": os.path.abspath(pages_path),
        "input_fingerprint": _input_fingerprint(pages_path),
        "num_partitions": num_partitions,
        "num_units": num_units,
    }
    marker = os.path.join(staging_dir, "_SUCCESS")
    if os.path.exists(marker):
        # a staged layout is only valid for the grid that built it:
        # reusing it under a different unit count would silently drop
        # the partitions that fall outside every unit's filter range
        try:
            with open(marker) as f:
                prev = json.load(f)
        except (json.JSONDecodeError, OSError):
            prev = None  # pre-grid marker: refuse (cannot validate)
        if prev != grid:
            raise ValueError(
                f"staging dir {staging_dir} was built for {prev}, "
                f"requested {grid}; use a fresh staging_dir"
            )
        return staging_dir

    from ..sources.synth import PIPELINE_COLUMNS

    try:
        pages = ray.data.read_parquet(pages_path, columns=PIPELINE_COLUMNS)
    except Exception:
        pages = ray.data.read_parquet(pages_path)
    routed = pages.map_batches(make_router(num_partitions), batch_format="pyarrow")

    # unit assignment must mirror run_extract_job's bounds EXACTLY:
    # build the lookup from the same formula instead of re-deriving it
    import numpy as np

    unit_of = np.empty(num_partitions, dtype=np.int32)
    for u in range(num_units):
        lo = u * num_partitions // num_units
        hi = (u + 1) * num_partitions // num_units
        unit_of[lo:hi] = u

    def add_unit(t: pa.Table) -> pa.Table:
        pid = t["partition_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "unit_id", pa.array(unit_of[pid], type=pa.int32())
        )

    tmp = staging_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(staging_dir, ignore_errors=True)
    routed.map_batches(add_unit, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["unit_id"]
    )
    os.rename(tmp, staging_dir)
    with open(marker, "w") as f:
        json.dump(grid, f)
    return staging_dir


def run_extract_job(
    pages_path: str,
    out_dir: str,
    *,
    num_units: int = 8,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    concurrency=None,
    batch_size: int = 64,
    resume: bool = True,
    giant_cap: int | None = None,
    staging_dir: str | None = None,
) -> list[dict]:
    """Resumable extraction job: per-unit streaming sub-jobs.

    Each unit covers partition ids ``[u*P/U, (u+1)*P/U)``; its output
    directory commits atomically and its manifest entry is written
    after commit, so a killed run re-does only unfinished units. At
    100 TB scale, units are the coarse recovery grain (hundreds to
    thousands); within a unit Ray's lineage handles task retries.

    Giant lane: rows whose payload exceeds ``giant_cap`` (default
    stages.extract.GIANT_ROW_BYTES) skip the main pool and are
    processed by a final dedicated unit — an uncapped 2-actor pool
    with single-row batches, so one multi-GiB document never stalls
    the fleet and still produces real output.

    ``staging_dir``: route + hive-partition the input by unit ONCE
    (stage_pages) so each unit reads only its own files instead of
    filtering a full scan — the fleet-scale layout (DESIGN.md). At
    ``num_units >= 32`` staging switches ON automatically (scan
    amplification of the filter-scan path is O(units)); pass
    ``staging_dir=""`` to force filter-scan anyway.
    """
    import ray.data

    from ..stages.extract import GIANT_ROW_BYTES

    if giant_cap is None:
        giant_cap = GIANT_ROW_BYTES
    if staging_dir is None and num_units >= 32:
        # keyed by the input path so a different input never reuses a
        # stale staging layout (stage_pages is idempotent per dir)
        import hashlib

        # the input FINGERPRINT is part of the key: regenerated input at
        # the same path must map to a fresh staging dir, not hard-fail
        # against the stale one's grid marker
        key = hashlib.sha256(
            f"{os.path.abspath(pages_path)}|{_input_fingerprint(pages_path)}"
            f"|{num_partitions}|{num_units}".encode()
        ).hexdigest()[:10]
        staging_dir = out_dir.rstrip("/") + f"_staging_{key}"
    elif staging_dir == "":
        staging_dir = None
    job_params = {
        "num_units": num_units,
        "num_partitions": num_partitions,
        "giant_cap": giant_cap,
        "pages_path": os.path.abspath(pages_path),
    }
    # grid guard FIRST: a mismatched resume must be refused before the
    # (full-corpus) staging pass spends minutes building a layout the
    # job is not allowed to use
    if resume:
        mf.check_job(out_dir, job_params)
    else:
        shutil.rmtree(out_dir, ignore_errors=True)
    if staging_dir is not None:
        stage_pages(
            pages_path,
            staging_dir,
            num_partitions=num_partitions,
            num_units=num_units,
        )
    done = mf.done_units(out_dir) if resume else set()
    os.makedirs(out_dir, exist_ok=True)
    mf.write_job(out_dir, job_params)

    results = []
    bounds = [
        (u, u * num_partitions // num_units, (u + 1) * num_partitions // num_units)
        for u in range(num_units)
    ]
    giant_unit_id = num_units  # dedicated final unit for giant rows
    for unit_id, lo, hi in bounds + [(giant_unit_id, None, None)]:
        if unit_id in done:
            continue
        t0 = time.monotonic()
        if staging_dir is not None and unit_id != giant_unit_id:
            unit_dir = os.path.join(staging_dir, f"unit_id={unit_id}")
            if not os.path.isdir(unit_dir):
                routed = None  # unit had no rows at all
            else:
                routed = ray.data.read_parquet(unit_dir)
        else:
            from ..sources.synth import PIPELINE_COLUMNS

            try:
                pages = ray.data.read_parquet(pages_path, columns=PIPELINE_COLUMNS)
            except Exception:
                pages = ray.data.read_parquet(pages_path)  # non-standard schema
            routed = pages.map_batches(
                make_router(num_partitions), batch_format="pyarrow"
            )
        if routed is None:
            mf.write_unit(
                out_dir,
                unit_id,
                {
                    "rows": 0,
                    "ok_rows": 0,
                    "err_rows": 0,
                    "bytes_in": 0,
                    "text_bytes": 0,
                    "partitions": 0,
                    "duration_sec": 0.0,
                    "docs_per_sec": 0.0,
                },
            )
            continue
        if unit_id == giant_unit_id:
            unit_ds = routed.map_batches(
                lambda t, cap=giant_cap: t.filter(
                    pc.greater(t["nbytes"], cap)
                ),
                batch_format="pyarrow",
            )
            extracted = unit_ds.map_batches(
                Extractor,
                batch_format="pyarrow",
                batch_size=1,
                concurrency=2,
                fn_constructor_kwargs={"giant_cap": None},
            )
        else:
            unit_ds = routed.map_batches(
                lambda t, lo=lo, hi=hi, cap=giant_cap: t.filter(
                    pc.and_(
                        pc.and_(
                            pc.greater_equal(t["partition_id"], lo),
                            pc.less(t["partition_id"], hi),
                        ),
                        pc.less_equal(t["nbytes"], cap),
                    )
                ),
                batch_format="pyarrow",
            )
            extracted = unit_ds.map_batches(
                Extractor,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency
                if concurrency is not None
                else default_concurrency(),
            )

        unit_out = mf.unit_out_dir(out_dir, unit_id)
        tmp_out = unit_out + ".tmp"
        shutil.rmtree(tmp_out, ignore_errors=True)
        shutil.rmtree(unit_out, ignore_errors=True)
        os.makedirs(tmp_out, exist_ok=True)  # empty units still commit
        # bound file counts: at fleet scale thousands of tiny part
        # files per unit wreck the downstream read path
        extracted.write_parquet(tmp_out, min_rows_per_file=50_000)
        os.rename(tmp_out, unit_out)

        # lineage metrics for the unit (small read over committed files)
        part_files = [
            f for f in os.listdir(unit_out) if f.endswith(".parquet")
        ]
        dt = time.monotonic() - t0
        if part_files:
            out_ds = ray.data.read_parquet(
                unit_out, columns=["ok", "nbytes", "text", "partition_id"]
            )
            m = partition_metrics(out_ds).to_pandas()
            metrics = {
                "rows": int(m["rows"].sum()),
                "ok_rows": int(m["ok_rows"].sum()),
                "err_rows": int(m["rows"].sum() - m["ok_rows"].sum()),
                "bytes_in": int(m["bytes_in"].sum()),
                "text_bytes": int(m["text_bytes"].sum()),
                "partitions": int(len(m)),
                "duration_sec": round(dt, 3),
                "docs_per_sec": round(float(m["rows"].sum()) / dt, 1),
            }
        else:  # empty unit (e.g. no giant rows): commit zero metrics
            metrics = {
                "rows": 0,
                "ok_rows": 0,
                "err_rows": 0,
                "bytes_in": 0,
                "text_bytes": 0,
                "partitions": 0,
                "duration_sec": round(dt, 3),
                "docs_per_sec": 0.0,
            }
        mf.write_unit(out_dir, unit_id, metrics)
        results.append({"unit_id": unit_id, **metrics})
    return results
