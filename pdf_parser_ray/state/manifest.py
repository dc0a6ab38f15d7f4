"""Per-unit lineage manifest: checkpoint + resume (SURVEY.md §4).

The resume unit is a *unit of input* (a contiguous slice of the
partition-id space). A unit's output directory commits atomically
(write to ``<dir>.tmp`` -> rename) and its manifest entry
``_manifest/unit_<id>.json`` (row counts, ok/err, bytes, duration,
docs/s) is written only after the rename. Resume = set-difference of
the unit grid against existing manifest entries (a driver-side
anti-join over unit ids — a few thousand entries at 100 TB scale —
never a Ray Data shuffle; SURVEY.md §2.5).

Concurrency contract: ONE writer per out_dir. Commits are atomic
(rename) so a crashed writer never leaves a half-unit visible, but two
simultaneous jobs on the same out_dir would race the renames; run
concurrent jobs against distinct out_dirs and merge afterwards.
"""

from __future__ import annotations

import json
import os


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def unit_path(out_dir: str, unit_id: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"unit_{unit_id:05d}.json")


def unit_out_dir(out_dir: str, unit_id: int) -> str:
    return os.path.join(out_dir, f"unit={unit_id:05d}")


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _write_json_durable(path: str, obj: dict) -> None:
    """tmp-write + fsync(file) + rename + fsync(dir): after a power
    loss an entry either exists complete or not at all — crash-resume
    is this module's contract, so rename alone is not enough."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    _fsync_dir(os.path.dirname(path))


def write_unit(out_dir: str, unit_id: int, metrics: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    _write_json_durable(unit_path(out_dir, unit_id), {"unit_id": unit_id, **metrics})


JOB_PARAM_KEYS = ("num_units", "num_partitions", "giant_cap", "pages_path")


def job_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "job.json")


def write_job(out_dir: str, params: dict) -> None:
    """Record the unit-grid parameters on first run (resume safety)."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    _write_json_durable(job_path(out_dir), params)


def check_job(out_dir: str, params: dict) -> None:
    """Refuse to resume when the unit grid changed: same out_dir with a
    different --units / --partitions / giant cap would silently skip
    units whose id matches but whose partition range differs."""
    p = job_path(out_dir)
    if not os.path.exists(p):
        return
    with open(p) as f:
        prev = json.load(f)
    diffs = {
        k: (prev.get(k), params.get(k))
        for k in JOB_PARAM_KEYS
        if prev.get(k) != params.get(k)
    }
    if diffs:
        raise ValueError(
            f"resume parameter mismatch for {out_dir}: {diffs}; "
            "use a fresh out_dir or resume=False to restart"
        )


def done_units(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("unit_") and name.endswith(".json"):
            done.add(int(name[5:-5]))
    return done


def read_manifest(out_dir: str) -> list[dict]:
    entries = []
    for uid in sorted(done_units(out_dir)):
        with open(unit_path(out_dir, uid)) as f:
            entries.append(json.load(f))
    return entries


def clear_unit(out_dir: str, unit_id: int) -> None:
    """Invalidate one unit (test/ops helper): removes manifest + output."""
    import shutil

    p = unit_path(out_dir, unit_id)
    if os.path.exists(p):
        os.remove(p)
    shutil.rmtree(unit_out_dir(out_dir, unit_id), ignore_errors=True)
