"""Parquet staging for multi-consumer Dataset intermediates.

``materialize()`` pins an intermediate in the distributed object store;
for corpus-sized data that turns store + spill volume into a second
copy of the corpus at fleet scale. Staging writes the intermediate to
partitioned parquet ONCE and re-reads it lazily per consumer, so the
footprint is disk by construction and each consumer streams.

Two flavors:

- :func:`stage_keyed` — write-once cache keyed on (version, tag,
  input fingerprint); concurrent-process safe (private tmp dir +
  ``os.rename`` publish, the build_pages_table pattern) and REUSED
  across runs, so the number of cache dirs is bounded by the number of
  distinct (tag, input) pairs, not by run count.
- :func:`stage_run_scoped` — for intermediates that are not a pure
  function of an input file (e.g. threshold-dependent candidate pair
  sets): a per-process run directory, registered with ``atexit`` for
  removal so repeated runs don't leak disk.

Placement: both write under ``$GRAFT_STAGE_ROOT`` (default
``/tmp/graft_stage``). Ray workers write fragments from whichever node
they run on and the re-read tasks run on arbitrary nodes, so on a
multi-node cluster this MUST be cluster-shared storage (NFS mount,
fuse-mounted object store) — or, at fleet scale, an object-store URI
passed straight through to ``write_parquet``/``read_parquet``; the env
var keeps that a one-line deployment change. Single-node (this
sandbox) needs no setup.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil

# Version prefix baked into every keyed cache path. The key otherwise
# captures only the INPUT identity (path + size/mtime fingerprint) —
# it cannot see the synthesis code. BUMP THIS whenever the transform
# behind any stage_keyed() call changes observable output (the GENVER
# lesson from sources/synth.py: stale caches serve old corpora
# silently).
STAGE_VER = "s1"


def _stage_root() -> str:
    return os.environ.get("GRAFT_STAGE_ROOT", "/tmp/graft_stage")


def _fingerprint(path: str) -> str:
    from .extract_pipeline import _input_fingerprint

    return _input_fingerprint(path)


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for f in os.listdir(d)
    )


def stage_keyed(tag: str, src_path: str, build):
    """Stage ``build()`` (a Dataset factory) to a write-once parquet
    cache keyed on (STAGE_VER, tag, fingerprint(src_path)); return a
    lazy ``read_parquet`` Dataset over it.

    ``build`` runs at most once per key per race; the tmp+rename
    publish means readers only ever see a complete cache, and a loser
    of the rename race discards its tmp dir and reads the winner's.

    Ray quirk: ``write_parquet`` of an empty dataset creates no files.
    An empty result is never published — callers get the (free at size
    zero) ``materialize()`` instead.
    """
    import hashlib

    import ray.data

    key = hashlib.sha1(
        f"{STAGE_VER}|{tag}|{os.path.abspath(src_path)}|{_fingerprint(src_path)}".encode()
    ).hexdigest()[:12]
    cache = os.path.join(_stage_root(), f"{tag}-{key}")
    if not _has_parquet(cache):
        tmp = f"{cache}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        build().write_parquet(tmp)
        if not _has_parquet(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
            return build().materialize()
        try:
            os.rename(tmp, cache)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return ray.data.read_parquet(cache)


_RUN_DIR: str | None = None
_RUN_SEQ = itertools.count()


def _run_dir() -> str:
    global _RUN_DIR
    if _RUN_DIR is None:
        d = os.path.join(_stage_root(), f"run-{os.getpid()}")
        os.makedirs(d, exist_ok=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _RUN_DIR = d
    return _RUN_DIR


def stage_run_scoped(ds, tag: str):
    """Stage an already-built Dataset to parquet in this process's run
    directory (removed at interpreter exit) and return a lazy re-read.

    Forces execution NOW — same plan-split property as
    ``materialize()`` (upstream resources are released before the
    consumer stage starts, which matters when an actor pool feeds a
    shuffle on a small cluster) — but the bytes land on disk, not in
    the object store. Falls back to ``materialize()`` for an empty
    dataset (no files written, and empty is free to pin)."""
    import ray.data

    d = os.path.join(_run_dir(), f"{tag}-{next(_RUN_SEQ)}")
    os.makedirs(d, exist_ok=True)
    ds.write_parquet(d)
    if not _has_parquet(d):
        return ds.materialize()
    return ray.data.read_parquet(d)
