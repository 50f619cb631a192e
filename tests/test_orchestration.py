"""Orchestration kernel (cdc_practice_spark/orchestration.py): the
reference's Airflow-layer contract — max_active_runs=1, bounded retry
with delay, run ledger, stale-lock takeover."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from cdc_practice_spark.orchestration import (
    ConcurrentRunError,
    JobSpec,
    _acquire_lock,
    _lock_path,
    read_ledger,
    run,
)


def _job(tmp_path, **kw):
    return JobSpec(
        name="etl", run_root=str(tmp_path), retry_delay_s=0.0, **kw
    )


def test_success_records_single_run(tmp_path):
    job = _job(tmp_path)
    rec = run(job, lambda: 42)
    assert rec["state"] == "success" and rec["attempt"] == 0
    states = [r["state"] for r in read_ledger(job)]
    assert states == ["running", "success"]
    assert not os.path.exists(_lock_path(job))  # lock released


def test_retry_then_success(tmp_path):
    job = _job(tmp_path, retries=2)
    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(f"boom {calls['n']}")
        return "ok"

    rec = run(job, flaky, sleep=delays.append)
    assert rec["state"] == "success" and rec["attempt"] == 2
    assert calls["n"] == 3
    assert delays == [0.0, 0.0]  # retry_delay honored between attempts
    states = [r["state"] for r in read_ledger(job)]
    assert states == ["running", "failed", "running", "failed", "running", "success"]


def test_retries_exhausted_reraises_and_releases_lock(tmp_path):
    job = _job(tmp_path, retries=1)

    def always():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        run(job, always, sleep=lambda _s: None)
    states = [r["state"] for r in read_ledger(job)]
    assert states == ["running", "failed", "running", "failed"]
    assert not os.path.exists(_lock_path(job))  # failed run must not wedge


def test_max_active_runs_one_rejects_concurrent(tmp_path):
    """A LIVE holder (separate real process) blocks a second trigger."""
    job = _job(tmp_path)
    holder = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        with open(_lock_path(job), "w") as fh:
            fh.write(str(holder.pid))
        with pytest.raises(ConcurrentRunError):
            run(job, lambda: 1)
        assert read_ledger(job) == []  # rejected before any attempt
    finally:
        holder.kill()
        holder.wait()


def test_stale_lock_from_dead_pid_is_taken_over(tmp_path):
    """A crashed run's lock (dead PID) must not wedge the job forever."""
    job = _job(tmp_path)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    with open(_lock_path(job), "w") as fh:
        fh.write(str(dead.pid))
    rec = run(job, lambda: "recovered")
    assert rec["state"] == "success"


def test_lock_reacquire_after_release(tmp_path):
    job = _job(tmp_path)
    run(job, lambda: 1)
    run(job, lambda: 2)  # manual re-trigger works (no catchup, no timer)
    assert [r["state"] for r in read_ledger(job)].count("success") == 2


def test_retried_streaming_job_converges_on_batch_state(tmp_path, spark, sf_dir):
    """The docstring's idempotence claim, end-to-end: a job whose first
    attempt dies MID-REPLAY (after ≥1 committed micro-batch) is retried
    whole by the runner; the checkpointed sink resumes instead of
    double-applying, and the final state equals the batch snapshot."""
    import os as _os

    from pyspark.sql import functions as F

    from cdc_practice_spark.cdc import build_current, change_feed_from_events
    from cdc_practice_spark.queries.streaming_queries import (
        split_events_into_files,
    )
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.streaming.pipeline import (
        load_current_state,
        read_events_stream,
        stream_current_upsert,
    )

    src = str(tmp_path / "src")
    _os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=3)
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    attempts = {"n": 0}

    def etl():
        attempts["n"] += 1
        q = stream_current_upsert(
            spark,
            read_events_stream(spark, src, max_files_per_trigger=1),
            state_root,
            ckpt,
        )
        if attempts["n"] == 1:
            # die mid-replay: wait for the first committed batch, stop
            import time as _t

            deadline = _t.time() + 120
            while _t.time() < deadline:
                if any(p["numInputRows"] > 0 for p in q.recentProgress):
                    break
                _t.sleep(0.2)
            q.stop()
            q.awaitTermination()
            raise RuntimeError("injected mid-replay failure")
        q.awaitTermination()

    job = JobSpec(name="stream_etl", run_root=str(tmp_path), retry_delay_s=0.0)
    rec = run(job, etl, sleep=lambda _s: None)
    assert rec["state"] == "success" and attempts["n"] == 2

    final = load_current_state(spark, state_root)
    batch = build_current(change_feed_from_events(load_table(spark, sf_dir, "events")))
    s = {(r.original_id, r.value, r.event_type) for r in final.collect()}
    b = {(r.original_id, r.value, r.event_type) for r in batch.collect()}
    assert s == b


def test_acquire_is_exclusive_within_process(tmp_path):
    job = _job(tmp_path)
    _acquire_lock(job)
    # same PID holds it: takeover branch treats self-owned as stale-safe
    # only for DEAD holders; a live same-pid holder is reacquired (the
    # run() flow never does this — belt-and-braces check that acquire
    # does not raise for our own pid, matching Airflow's same-scheduler
    # re-entrancy)
    _acquire_lock(job)
