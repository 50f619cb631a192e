"""Streaming-path throughput: replay the sf events table through the
DEFAULT upsert sink (bucketed incremental MERGE) and the append history
sink as real micro-batches, and report events/sec + per-batch latency.

This is the apples-to-apples number against the reference's runtime: its
consumer loop pays ≥3 synchronous Postgres round-trips + a txn commit
PER EVENT on one thread (BASELINE.md — simple_kafka_etl.py:65-182), an
implied ceiling of a few hundred events/sec.  The engine processes the
same logical stream as set-oriented micro-batches.

Usage: python tools/bench_streaming.py [sf_dir] [n_files]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from cdc_practice_spark.queries.streaming_queries import (
        split_events_into_files,
    )
    from cdc_practice_spark.session import get_spark, load_table
    from cdc_practice_spark.streaming.pipeline import (
        load_current_state,
        read_events_stream,
        stream_current_upsert,
        stream_history_append,
    )

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = load_table(spark, sf_dir, "events").count()

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        split_events_into_files(spark, sf_dir, src, n_files=n_files)

        results: dict[str, dict] = {}

        # upsert sink (the reference's bank_accounts_current apply loop)
        t0 = time.perf_counter()
        q = stream_current_upsert(
            spark,
            read_events_stream(spark, src, max_files_per_trigger=1),
            os.path.join(work, "state"),
            os.path.join(work, "ckpt_upsert"),
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        n_keys = load_current_state(spark, os.path.join(work, "state")).count()
        results["upsert_bucketed"] = {
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "n_batches": len(batches),
            "mean_batch_ms": round(
                sum(p["batchDuration"] for p in batches) / max(len(batches), 1), 1
            ),
            "final_keys": n_keys,
        }

        # append history sink (bank_accounts_history)
        t0 = time.perf_counter()
        q2 = stream_history_append(
            read_events_stream(spark, src, max_files_per_trigger=1),
            os.path.join(work, "hist"),
            os.path.join(work, "ckpt_hist"),
        )
        q2.awaitTermination()
        wall2 = time.perf_counter() - t0
        results["history_append"] = {
            "wall_sec": round(wall2, 3),
            "events_per_sec": round(n_events / wall2, 1),
        }

        # maintained-MV sink (snapshot + per-group count/sum view, the
        # r5 streaming IVM tier — pays the extra per-epoch MV delta)
        from cdc_practice_spark.streaming.pipeline import stream_maintained_mv

        t0 = time.perf_counter()
        q3 = stream_maintained_mv(
            spark,
            read_events_stream(spark, src, max_files_per_trigger=1),
            state_root=os.path.join(work, "state_mv"),
            mv_root=os.path.join(work, "mv"),
            checkpoint_dir=os.path.join(work, "ckpt_mv"),
        )
        q3.awaitTermination()
        wall3 = time.perf_counter() - t0
        results["maintained_mv"] = {
            "wall_sec": round(wall3, 3),
            "events_per_sec": round(n_events / wall3, 1),
        }

        print(
            json.dumps(
                {
                    "metric": "streaming_replay",
                    "sf_dir": sf_dir,
                    "n_events": n_events,
                    "n_files": n_files,
                    "sinks": results,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
