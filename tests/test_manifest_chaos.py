"""Crash-injection drive of the durable-manifest contract
(state/manifest.py): a crash at EITHER side of the manifest rename
must never double-commit or lose a unit on resume (VERDICT r2 #8)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class Crash(Exception):
    pass


N_DOCS = 36
UNITS = 4
PARTS = 16


@pytest.fixture()
def pages_input(tmp_path):
    from pdf_parser_ray.sources import synth

    t = pa.table(
        {
            "doc_id": pa.array(list(range(N_DOCS)), pa.int64()),
            "text": pa.array(
                [f"document {i} with some words in it" for i in range(N_DOCS)]
            ),
            "lang": pa.array(["en"] * N_DOCS),
        }
    )
    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(synth.synth_batch(t), src / "part.parquet")
    return str(src)


def _drive_crash_then_resume(tmp_path, pages_input, monkeypatch, crash_point):
    """Run the job, crash at ``crash_point`` during unit 1's manifest
    commit, undo the fault, resume, and validate exactly-once output."""
    import ray.data

    from pdf_parser_ray.pipelines.extract_pipeline import run_extract_job
    from pdf_parser_ray.state import manifest as mf

    out = str(tmp_path / f"out_{crash_point}")
    target = mf.unit_path(out, 1)

    if crash_point == "before_rename":
        real_rename = os.rename

        def faulty(src, dst):
            if dst == target:
                raise Crash("power loss before manifest rename")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", faulty)
    else:  # after_rename: the entry lands, the directory fsync is lost
        real_fsync_dir = mf._fsync_dir

        def faulty(path):
            if os.path.exists(target):
                raise Crash("power loss after manifest rename")
            return real_fsync_dir(path)

        monkeypatch.setattr(mf, "_fsync_dir", faulty)

    with pytest.raises(Crash):
        run_extract_job(
            pages_input, out, num_units=UNITS, num_partitions=PARTS
        )
    monkeypatch.undo()

    done_before = mf.done_units(out)
    res = run_extract_job(
        pages_input, out, num_units=UNITS, num_partitions=PARTS
    )
    resumed = {r["unit_id"] for r in res}

    # resume re-ran exactly the units with no manifest entry
    assert resumed == set(range(UNITS + 1)) - done_before
    # exactly-once output: every url exactly once, total rows exact
    rows = ray.data.read_parquet(out).to_pandas()
    assert len(rows) == N_DOCS
    assert rows["url"].nunique() == N_DOCS
    # manifest totals agree with the data (no double-counted unit)
    total = sum(e["rows"] for e in mf.read_manifest(out))
    assert total == N_DOCS
    return done_before


def test_crash_before_manifest_rename(
    ray_session, tmp_path, pages_input, monkeypatch
):
    """Entry absent after crash -> the committed unit output is
    discarded and re-done once; nothing is lost or duplicated."""
    done_before = _drive_crash_then_resume(
        tmp_path, pages_input, monkeypatch, "before_rename"
    )
    assert 1 not in done_before  # the crashed unit's entry never landed


def test_crash_after_manifest_rename(
    ray_session, tmp_path, pages_input, monkeypatch
):
    """Entry present after crash (rename is the commit point; the dir
    fsync only narrows the power-loss window) -> resume SKIPS the unit
    and its committed output is served as-is."""
    done_before = _drive_crash_then_resume(
        tmp_path, pages_input, monkeypatch, "after_rename"
    )
    assert 1 in done_before  # the crashed unit's entry did land
