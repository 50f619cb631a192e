"""Source/sink builder contracts (no DB/broker in container — option
correctness + the parse paths that are engine-agnostic)."""

from __future__ import annotations

from cdc_practice_spark.sources.jdbc import jdbc_read_options, jdbc_write_options


def test_jdbc_read_partitioned():
    opts = jdbc_read_options(
        "jdbc:postgresql://dw:5432/dw",
        "bank_accounts_history",
        partition_column="original_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "original_id"
    assert opts["numPartitions"] == "16"
    assert int(opts["fetchsize"]) >= 1000


def test_jdbc_read_unpartitioned_has_no_bounds():
    opts = jdbc_read_options("jdbc:mysql://oltp:3306/bankdb", "bank_accounts")
    assert "partitionColumn" not in opts


def test_jdbc_write_isolation_matches_reference():
    opts = jdbc_write_options("jdbc:postgresql://dw:5432/dw", "bank_accounts_current")
    # per-event commit in the reference (simple_kafka_etl.py:182) →
    # READ_COMMITTED batches here
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert int(opts["batchsize"]) >= 1000


def test_jdbc_write_path_executes_against_embedded_derby(spark, tmp_path):
    """EXECUTE the JDBC write path, not just its options: Spark ships
    the Derby driver, so an embedded-Derby database stands in for the
    reference's Postgres DW (same DataFrameWriter JDBC code path,
    different dialect).  Round-trip: append 3 batches → partitioned
    JDBC read returns exactly the appended rows."""
    from cdc_practice_spark.sources.jdbc import read_jdbc_table, write_jdbc_append

    url = f"jdbc:derby:{tmp_path}/dw;create=true"
    rows = [(i, 1000 + i, f"Bank {i:03d}") for i in range(30)]
    df = spark.createDataFrame(rows, "original_id long, user_id long, account string")

    # three appends = three micro-batch sink invocations (S8 pattern);
    # the first one creates the table
    for k in range(3):
        write_jdbc_append(
            df.filter(f"original_id % 3 = {k}"), url, "bank_accounts_history"
        )

    back = read_jdbc_table(
        spark,
        url,
        "bank_accounts_history",
        partition_column="original_id",
        lower_bound=0,
        upper_bound=30,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # partitioned scan, not 1 conn
    got = {(r.original_id, r.user_id, r.account) for r in back.collect()}
    assert got == set(rows)


def test_jdbc_append_is_batched_not_row_at_a_time(spark, tmp_path):
    """The reference commits per event (simple_kafka_etl.py:182); the
    engine's writer must instead push batched inserts — verify the
    batchsize option survives into an executed write (1k rows, 1 batch
    boundary) and the table holds exactly the input."""
    from cdc_practice_spark.sources.jdbc import read_jdbc_table, write_jdbc_append

    url = f"jdbc:derby:{tmp_path}/dw2;create=true"
    df = spark.range(1000).selectExpr(
        "id AS original_id", "id % 7 AS user_id", "CAST(id AS STRING) AS account"
    )
    write_jdbc_append(df, url, "bank_accounts_current", batch_size=256)
    back = read_jdbc_table(spark, url, "bank_accounts_current")
    assert back.count() == 1000
    assert back.agg({"original_id": "sum"}).collect()[0][0] == 499500


def test_jsonl_csv_orc_roundtrip(spark, tmp_path):
    """Events written as JSONL / CSV / ORC read back identically through
    the explicit-schema readers (no inference pass)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from cdc_practice_spark.sources import files as FS

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ])
    src = spark.createDataFrame(
        [(1, 10, "click", 1.5), (2, 11, "purchase", 99.25), (3, 10, "error", 0.0)],
        schema,
    )
    expect = {tuple(r) for r in src.collect()}

    jdir, cdir, odir = (str(tmp_path / d) for d in ("j", "c", "o"))
    src.coalesce(1).write.json(jdir)
    src.coalesce(1).write.option("header", "true").csv(cdir)  # header dropped by reader
    src.coalesce(1).write.orc(odir)

    got_j = FS.good_rows(FS.read_jsonl(spark, jdir, schema)).select(*schema.fieldNames())
    got_c = FS.good_rows(FS.read_csv(spark, cdir, schema, header=True)).select(*schema.fieldNames())
    got_o = FS.read_orc(spark, odir).select(*schema.fieldNames())
    for got in (got_j, got_c, got_o):
        assert {tuple(r) for r in got.collect()} == expect


def test_jsonl_malformed_line_isolated(spark, tmp_path):
    """One garbage line in a JSONL file becomes a quarantined corrupt
    row, not a failed scan (per-message error isolation, engine-shaped)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cdc_practice_spark.sources import files as FS

    p = tmp_path / "in.jsonl"
    p.write_text('{"event_id": 1, "event_type": "click"}\nNOT JSON AT ALL\n'
                 '{"event_id": 2, "event_type": "view"}\n')
    schema = StructType([
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ])
    df = FS.read_jsonl(spark, str(p), schema)
    assert FS.good_rows(df).count() == 2
    bad = FS.corrupt_rows(df).collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0][0]


def test_python_datasource_debezium_jsonl(spark, tmp_path):
    """Spark 4 Python DataSource: JSONL capture files read as the
    debezium_jsonl format must produce exactly what parse_debezium
    yields from the equivalent Kafka records — tombstones filtered,
    line number as offset, one partition per file."""
    import json

    from cdc_practice_spark.sources.kafka import parse_debezium
    from cdc_practice_spark.sources.pyds import register as register_pyds

    assert register_pyds(spark)
    payloads = [
        {"id": 1, "user_id": 10, "account": "A",
         "registered_at": "2024-01-01 00:00:00", "__deleted": "false"},
        {"id": 1, "user_id": 10, "account": "B",
         "registered_at": "2024-01-01 00:00:00", "__deleted": "false"},
        None,  # tombstone line
        {"id": 2, "user_id": 20, "account": "C",
         "registered_at": "2024-01-02 00:00:00", "__deleted": "true"},
    ]
    cap = tmp_path / "cap"
    cap.mkdir()
    (cap / "part-000.jsonl").write_text(
        "\n".join(json.dumps(p) for p in payloads) + "\n"
    )
    got = (
        spark.read.format("debezium_jsonl")
        .option("path", str(cap))
        .load()
        .orderBy("kafka_offset")
        .collect()
    )
    # twin: the same payloads as Kafka records through parse_debezium
    kafka_rows = [
        ("dbserver1.bankdb.bank_accounts", 0, i,
         json.dumps(p).encode() if p is not None else None)
        for i, p in enumerate(payloads)
    ]
    kafka_df = spark.createDataFrame(
        kafka_rows, "topic string, partition int, offset long, value binary"
    )
    want = parse_debezium(kafka_df).orderBy("kafka_offset").collect()
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g.kafka_offset == w.kafka_offset
        assert g.id == w.id and g.user_id == w.user_id
        assert g.account == w.account and g["__deleted"] == w["__deleted"]
    # partition granularity: a second file becomes its own partition
    (cap / "part-001.jsonl").write_text(json.dumps(payloads[0]) + "\n")
    df2 = spark.read.format("debezium_jsonl").option("path", str(cap)).load()
    assert df2.select("kafka_partition").distinct().count() == 2


def test_python_datasource_stream_tails_captures(spark, tmp_path):
    """Streaming debezium_jsonl: first availableNow run consumes
    existing lines; appended lines are picked up by a SECOND run on the
    same checkpoint (offset = per-file line counts) — incremental tail
    with exactly-once recovery."""
    import json

    from cdc_practice_spark.sources.pyds import register as register_pyds

    assert register_pyds(spark)
    cap = tmp_path / "cap"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    cap.mkdir()
    f = cap / "part-000.jsonl"

    def row(i, acct):
        return json.dumps(
            {"id": i, "user_id": i * 10, "account": acct,
             "registered_at": "2024-01-01 00:00:00", "__deleted": "false"}
        )

    f.write_text(row(1, "A") + "\n" + row(2, "B") + "\n")

    def run_once():
        q = (
            spark.readStream.format("debezium_jsonl")
            .option("path", str(cap))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(str(out)).collect()
    assert sorted(r.id for r in first) == [1, 2]

    # append one line + add a tombstone; second run sees ONLY the new row
    with f.open("a") as fh:
        fh.write("null\n" + row(3, "C") + "\n")
    run_once()
    second = spark.read.parquet(str(out)).collect()
    assert sorted(r.id for r in second) == [1, 2, 3]
    assert {r.kafka_offset for r in second if r.id == 3} == {3}


def test_python_datasource_write_read_roundtrip(spark, tmp_path):
    """debezium_jsonl write path: a feed written as capture files reads
    back with identical payloads (Kafka coordinates are regenerated by
    the reader — transport, not payload)."""
    from cdc_practice_spark.sources.pyds import register as register_pyds

    assert register_pyds(spark)
    rows = [
        (1, 10, "A", "2024-01-01 00:00:00", "false"),
        (2, 20, "B", "2024-01-02 00:00:00", "true"),
        (3, 30, "C", "2024-01-03 00:00:00", "false"),
    ]
    df = spark.createDataFrame(
        rows, "id long, user_id long, account string, "
        "registered_at string, __deleted string"
    ).coalesce(1)
    out = str(tmp_path / "export")
    df.write.format("debezium_jsonl").option("path", out).mode("append").save()
    import os as _os

    assert "_SUCCESS" in _os.listdir(out)
    back = (
        spark.read.format("debezium_jsonl").option("path", out).load()
        .select("id", "user_id", "account", "registered_at", "__deleted")
        .orderBy("id")
        .collect()
    )
    assert [tuple(r) for r in back] == rows


def test_python_datasource_writer_commit_contract(spark, tmp_path):
    """The writer's task-commit contract: _SUCCESS is a manifest of
    exactly the committed part files; readers honor it, so (a) orphan
    parts from failed/speculative attempts are never replayed, and
    (b) mode("overwrite") actually replaces prior data instead of
    silently appending."""
    import json as _json
    import os as _os

    from cdc_practice_spark.sources.pyds import register as register_pyds

    assert register_pyds(spark)
    ddl = (
        "id long, user_id long, account string, "
        "registered_at string, __deleted string"
    )
    out = str(tmp_path / "export")
    write = lambda rows, mode: (
        spark.createDataFrame(rows, ddl)
        .coalesce(1)
        .write.format("debezium_jsonl")
        .option("path", out)
        .mode(mode)
        .save()
    )
    read_ids = lambda: sorted(
        r.id
        for r in spark.read.format("debezium_jsonl").option("path", out).load().collect()
    )

    write([(1, 10, "A", "2024-01-01 00:00:00", "false")], "append")
    write([(2, 20, "B", "2024-01-02 00:00:00", "false")], "append")
    manifest = _json.loads(open(_os.path.join(out, "_SUCCESS")).read())
    on_disk = {f for f in _os.listdir(out) if f.endswith(".jsonl")}
    # append merged both commits into the manifest
    assert set(manifest["files"]) == on_disk and len(on_disk) == 2
    assert read_ids() == [1, 2]

    # an orphan part (failed/speculative attempt) is on disk but NOT in
    # the manifest — the reader must not replay it
    with open(_os.path.join(out, "part-orphan.jsonl"), "w") as fh:
        fh.write('{"id": 99, "user_id": 9, "account": "X", '
                 '"registered_at": "2024-01-09 00:00:00", "__deleted": "false"}\n')
    assert read_ids() == [1, 2]

    # overwrite replaces: old parts AND the orphan are gone, one part remains
    write([(3, 30, "C", "2024-01-03 00:00:00", "false")], "overwrite")
    remaining = {f for f in _os.listdir(out) if f.endswith(".jsonl")}
    manifest = _json.loads(open(_os.path.join(out, "_SUCCESS")).read())
    assert len(remaining) == 1 and set(manifest["files"]) == remaining
    assert read_ids() == [3]


def test_python_datasource_filter_pushdown(spark, tmp_path):
    """pushFilters: kafka_partition predicates prune FILES before IO,
    kafka_offset ranges prune LINES (lower bound skips, upper bound
    stops the scan) — and the pushed results equal the unpushed
    semantics exactly (the pushFilters contract: accepted filters are
    fully enforced by the reader)."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from cdc_practice_spark.sources.pyds import (
        DebeziumJsonlReader,
        register as register_pyds,
    )

    assert register_pyds(spark)
    cap = tmp_path / "cap"
    cap.mkdir()
    for p in range(3):
        rows = [
            _json.dumps(
                {"id": p * 10 + i, "user_id": p, "account": f"a{p}{i}",
                 "registered_at": "2024-01-01 00:00:00", "__deleted": "false"}
            )
            for i in range(5)
        ]
        (cap / f"part-{p:03d}.jsonl").write_text("\n".join(rows) + "\n")

    # unit tier: the reader object itself prunes
    r = DebeziumJsonlReader({"path": str(cap)})
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("kafka_partition",), 1),
                GreaterThanOrEqual(("kafka_offset",), 1),
                LessThan(("kafka_offset",), 4),
                EqualTo(("account",), "a11"),  # not pushable
            ]
        )
    )
    assert [type(f).__name__ for f in unsupported] == ["EqualTo"]
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].partition_id == 1  # file pruning
    offsets = [row[2] for row in r.read(parts[0])]
    assert offsets == [1, 2, 3]  # line-range pruning, upper bound stops

    # end-to-end tier: pushed plan == semantics of the same filters
    df = spark.read.format("debezium_jsonl").option("path", str(cap)).load()
    got = sorted(
        (row.kafka_partition, row.kafka_offset, row.id)
        for row in df.filter(
            (F.col("kafka_partition") == 1)
            & (F.col("kafka_offset") >= 1)
            & (F.col("kafka_offset") < 4)
            & (F.col("account") != "a11")
        ).collect()
    )
    assert got == [(1, 2, 12), (1, 3, 13)]


def test_jdbc_kill_resume_exactly_once(spark, sf_dir, tmp_path):
    """P11 through the DATABASE sink (VERDICT r5 ask #7): stream the
    events feed into an embedded-Derby history table via the
    epoch-idempotent JDBC writer, kill the stream after ≥1 committed
    micro-batch, resume from the checkpoint to completion.  The table
    must hold EXACTLY the batch feed — no lost epoch, no double-applied
    epoch — and manually re-running an epoch (a foreachBatch retry) must
    be a no-op."""
    import os
    import tempfile
    import time

    from cdc_practice_spark.cdc import change_feed_from_events
    from cdc_practice_spark.queries.streaming_queries import (
        TMP_ROOT,
        split_events_into_files,
    )
    from cdc_practice_spark.session import load_table
    from cdc_practice_spark.sources.jdbc import (
        read_jdbc_table,
        write_jdbc_epoch_idempotent,
    )
    from cdc_practice_spark.streaming.pipeline import read_events_stream

    os.makedirs(TMP_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="jdbckill_", dir=TMP_ROOT)
    src = os.path.join(work, "src")
    os.makedirs(src)
    split_events_into_files(spark, sf_dir, src, n_files=4)
    url = f"jdbc:derby:{work}/dw;create=true"
    table = "bank_accounts_history"
    seen_epochs: list[tuple[int, object]] = []

    def sink(batch_df, epoch_id):
        out = batch_df.select(
            "kafka_offset", "original_id", "value", "__deleted"
        )
        write_jdbc_epoch_idempotent(out, url, table, epoch_id)
        seen_epochs.append((epoch_id, out))

    def start():
        feed = change_feed_from_events(
            read_events_stream(spark, src, max_files_per_trigger=1)
        )
        return (
            feed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    mid = read_jdbc_table(spark, url, table).count()
    assert mid > 0  # genuinely mid-replay

    q2 = start()
    q2.awaitTermination()

    feed_batch = change_feed_from_events(load_table(spark, sf_dir, "events"))
    expect = {
        (r.kafka_offset, r.original_id, r.value, r["__deleted"])
        for r in feed_batch.collect()
    }
    got_df = read_jdbc_table(spark, url, table)
    got = {
        (r.kafka_offset, r.original_id, r.value, r["__deleted"])
        for r in got_df.collect()
    }
    assert got_df.count() == len(expect)  # exactly once, not just set-equal
    assert got == expect

    # a foreachBatch RETRY of an already-committed epoch must be a no-op
    epoch_id, frame = seen_epochs[-1]
    write_jdbc_epoch_idempotent(frame, url, table, epoch_id)
    assert read_jdbc_table(spark, url, table).count() == len(expect)
