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


def write_unit(out_dir: str, unit_id: int, metrics: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = unit_path(out_dir, unit_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"unit_id": unit_id, **metrics}, f, sort_keys=True)
    os.rename(tmp, unit_path(out_dir, unit_id))


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
