"""CDC warehouse queries — the reference's core semantic surface.

Covers SURVEY.md §2 inventory IDs: S3/S5 (from_json unwrap), P1 (tombstone
filter), P2 (type dispatch), P3 (idempotent dedup), P4/P5 (existence /
lookup joins → windows), P6 (projection/rename), P7 (change_type +
derived timestamps), P8–P10 (delete/update/insert apply → snapshot),
S8 (append history), Q6 (per-user stats), plus the reference's read-side
queries Q1–Q5 (README.md:106-108, test-etl-pipeline.sh:244-259).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_practice_spark.cdc import (
    build_current,
    build_history,
    build_user_stats,
    change_feed_from_events,
)
from cdc_practice_spark.plans.cache import tracked_persist
from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table, memo_view


def _feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The normalized change feed is a deterministic view over `events`;
    # every cdc_* query starts from it, so register its plan once per
    # session (memo_view caches the logical plan, never data).
    return memo_view(
        spark,
        ("cdc_feed", sf_dir),
        lambda: change_feed_from_events(load_table(spark, sf_dir, "events")),
    )


def _feed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dedup-invariant consumers only (one-pass IVM forms whose first
    # touch is a per-key max_by/max aggregation): same feed minus the
    # P3 coordinate-dedup window — see change_feed_from_events'
    # coord_dedup contract.  Semantically identical on any feed whose
    # duplicates are redeliveries (byte-identical); measurably cheaper
    # because the per-key exchange becomes map-side combinable.
    return memo_view(
        spark,
        ("cdc_feed_nodedup", sf_dir),
        lambda: change_feed_from_events(
            load_table(spark, sf_dir, "events"), coord_dedup=False
        ),
    )


def _us(col: str) -> F.Column:
    """Event-time timestamp → epoch-µs BIGINT (timezone/type-proof vs oracle)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _events_max_offset(spark: SparkSession, sf_dir: str) -> int:
    """max(event_id) of the fixture, memoized per sf_dir — the T every
    mid-feed-DDL wire builder derives its ALTER position from (one
    1-row-stats job per session, not per query)."""
    from cdc_practice_spark.plans.hints import _STATS_CACHE

    key = ("events_max_offset", sf_dir)
    if key not in _STATS_CACHE:
        _STATS_CACHE[key] = (
            load_table(spark, sf_dir, "events").agg(F.max("event_id")).collect()[0][0]
        )
    return _STATS_CACHE[key]


# Shared oracle CTE: the normalized change feed + change_type + carry-forward,
# mirroring cdc/feed.py + cdc/history.py exactly.
FEED_CTE = """
feed AS (
  SELECT event_id AS kafka_offset,
         0 AS kafka_partition,
         'dbserver1.bankdb.bank_accounts' AS kafka_topic,
         user_id AS original_id,
         event_type,
         value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted,
         CAST(json_extract(props, '$.k') AS INTEGER) AS props_k
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type,
         lag(__deleted) OVER w AS prev_deleted
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
carried AS (
  SELECT * EXCLUDE (prev_deleted),
         -- a DELETE with no live predecessor looks up nothing: the
         -- reference's registered_at probe misses -> NULL (the
         -- last-INSERT carry must not leak across a delete boundary)
         CASE WHEN change_type = 'DELETE'
               AND (prev_deleted IS NULL OR prev_deleted = 'true') THEN NULL
              ELSE last_value(CASE WHEN change_type = 'INSERT'
                                   THEN registered_at END
                              IGNORE NULLS)
                     OVER (PARTITION BY original_id ORDER BY kafka_offset
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         END AS original_registered_at
  FROM typed
)
"""


@register(
    "cdc_current_snapshot",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       props_k,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def cdc_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bank_accounts_current analog (S9/P4/P8-P10) — latest live row per key
    with first-INSERT carry-forward (simple_kafka_etl.py:108,133-138,159-163)."""
    cur = build_current(_feed(spark, sf_dir))
    return cur.select(
        "original_id",
        "user_id",
        "value",
        "event_type",
        "props_k",
        _us("original_registered_at").alias("original_registered_at_us"),
        _us("last_updated_at").alias("last_updated_at_us"),
    )


@register(
    "cdc_history",
    oracle=f"""
WITH {FEED_CTE}
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       change_type,
       epoch_us(registered_at) AS change_timestamp_us,
       epoch_us(original_registered_at) AS original_registered_at_us,
       kafka_offset, kafka_partition, kafka_topic
FROM carried
""",
)
def cdc_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bank_accounts_history analog (S8/P5-P7) — one audit row per change
    event with derived change_type (simple_kafka_etl.py:97-105,146-155,166-175)."""
    hist = build_history(_feed(spark, sf_dir))
    return hist.select(
        "original_id",
        "user_id",
        "value",
        "event_type",
        "change_type",
        _us("change_timestamp").alias("change_timestamp_us"),
        _us("original_registered_at").alias("original_registered_at_us"),
        "kafka_offset",
        "kafka_partition",
        "kafka_topic",
    )


@register(
    "cdc_user_stats",
    oracle=f"""
WITH {FEED_CTE}
SELECT original_id AS user_id,
       count(*) AS n_changes,
       CAST(sum(CASE WHEN change_type = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       CAST(sum(CASE WHEN change_type = 'UPDATE' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       CAST(sum(CASE WHEN change_type = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       epoch_us(min(registered_at)) AS first_change_at_us,
       epoch_us(max(registered_at)) AS last_change_at_us
FROM typed
GROUP BY original_id
""",
)
def cdc_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_account_stats analog (Q6) — per-user grouped aggregate
    (README.md:38,108; schema inference documented in cdc/stats.py)."""
    hist = build_history(_feed(spark, sf_dir))
    stats = build_user_stats(hist)
    return stats.select(
        "user_id",
        "n_changes",
        "n_inserts",
        "n_updates",
        "n_deletes",
        _us("first_change_at").alias("first_change_at_us"),
        _us("last_change_at").alias("last_change_at_us"),
    )


@register(
    "cdc_user_stats_current",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
)
SELECT original_id AS user_id,
       count(*) AS account_count,
       epoch_us(min(original_registered_at)) AS first_registered_at_us,
       epoch_us(max(registered_at)) AS last_updated_at_us
FROM cur
GROUP BY original_id
""",
)
def cdc_user_stats_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README's literal inference for user_account_stats — GROUP BY
    user over CURRENT accounts (README.md:38,108; FIXTURES.md A5) —
    complementing cdc_user_stats which aggregates the history log."""
    cur = build_current(_feed(spark, sf_dir))
    return cur.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("account_count"),
        _us_agg(F.min("original_registered_at")).alias("first_registered_at_us"),
        _us_agg(F.max("last_updated_at")).alias("last_updated_at_us"),
    )


def _us_agg(c: F.Column) -> F.Column:
    return F.unix_micros(c.cast("timestamp"))


@register(
    "cdc_replay_idempotency",
    oracle=f"""
WITH {FEED_CTE}
SELECT count(*) AS n_events,
       count(DISTINCT original_id) AS n_keys,
       count(DISTINCT kafka_offset) AS n_offsets
FROM feed
""",
)
def cdc_replay_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 effectively-once: replaying the feed (union with itself —
    `auto_offset_reset='earliest'` re-consumption, simple_kafka_etl.py:52)
    followed by coordinate dedup must be a no-op.  The oracle sees the
    single feed; Spark sees the doubled one — counts must match."""
    events = load_table(spark, sf_dir, "events")
    doubled = change_feed_from_events(events.unionAll(events))
    return doubled.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("original_id").alias("n_keys"),
        F.countDistinct("kafka_offset").alias("n_offsets"),
    )


@register(
    "q2_topk_changes",
    oracle=f"""
WITH {FEED_CTE}
SELECT original_id, change_type, value,
       epoch_us(registered_at) AS change_timestamp_us,
       kafka_offset
FROM carried
ORDER BY registered_at DESC, kafka_offset DESC
LIMIT 10
""",
)
def q2_topk_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 top-k: `ORDER BY change_timestamp DESC LIMIT 10` (README.md:106,
    test-etl-pipeline.sh:244).  Catalyst compiles this to
    TakeOrderedAndProject — per-partition heaps, no global sort.
    kafka_offset tiebreak keeps the result set deterministic."""
    hist = build_history(_feed(spark, sf_dir))
    return (
        hist.select(
            "original_id",
            "change_type",
            "value",
            _us("change_timestamp").alias("change_timestamp_us"),
            "kafka_offset",
        )
        .orderBy(F.col("change_timestamp_us").desc(), F.col("kafka_offset").desc())
        .limit(10)
    )


@register(
    "q4_scalar_counts",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT (SELECT count(*) FROM carried) AS history_count,
       (SELECT count(*) FROM ranked WHERE rn = 1 AND __deleted = 'false')
         AS current_count
""",
)
def q4_scalar_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 scalar counts of both warehouse tables
    (test-etl-pipeline.sh:255,259)."""
    feed = _feed(spark, sf_dir)
    hist_n = build_history(feed).agg(F.count(F.lit(1)).alias("history_count"))
    cur_n = build_current(feed).agg(F.count(F.lit(1)).alias("current_count"))
    return hist_n.crossJoin(cur_n)


@register(
    "q5_filter_equality",
    oracle=f"""
WITH {FEED_CTE}
SELECT original_id, event_type, value, __deleted,
       epoch_us(registered_at) AS registered_at_us, kafka_offset
FROM carried
WHERE original_id = 7
""",
)
def q5_filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 equality-predicate filter (`WHERE user_id = ...`, README.md:96-97,
    simple_kafka_etl.py:91,108,128).  The predicate pushes down into the
    parquet scan (PushedFilters in .explain)."""
    hist = change_feed_from_events(
        load_table(spark, sf_dir, "events").filter(F.col("user_id") == 7)
    )
    typed = build_history(hist.filter(F.col("original_id") == 7))
    # re-derive on the filtered feed: per-key windows are unaffected by
    # dropping other keys, so filter-before-window is semantics-preserving
    # AND prunes the shuffle — the plan a 100 TB scan needs.
    return typed.select(
        "original_id",
        "event_type",
        F.col("value"),
        F.when(F.col("change_type") == "DELETE", "true").otherwise("false").alias("__deleted"),
        _us("change_timestamp").alias("registered_at_us"),
        "kafka_offset",
    )


@register(
    "cdc_schema_drift_rescue",
    oracle="""
SELECT CASE WHEN event_type = 'purchase' THEN 'risk_score'
            WHEN event_type = 'click' THEN 'source_region'
            ELSE '' END AS rescued_keys,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_drifted,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN user_id % 100 ELSE 0 END)
            AS BIGINT) AS risk_sum,
       CAST(count(DISTINCT CASE WHEN event_type = 'click'
            THEN 'r' || CAST(user_id % 5 AS VARCHAR) END) AS BIGINT) AS n_region_vals
FROM events
GROUP BY 1
""",
)
def cdc_schema_drift_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift / DDL evolution (the surface Debezium's schema-history
    topic exists for, mysql-connector-config-clean.json:17,20): replay the
    feed as wire JSON where the upstream source has been ALTERed — purchase
    events carry an added ``risk_score`` column, clicks an added
    ``source_region`` — and parse it with the engine's FIXED StructType
    plus rescue (sources/kafka.py::parse_debezium(rescue=True)).

    The oracle recomputes, straight from ``events``, exactly what the
    rescued map must contain — so a parse path that silently drops the
    unknown columns (plain from_json) hash-fails on risk_sum /
    n_region_vals.  All JVM: to_json + two from_json in one projection,
    one aggregation shuffle."""
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    # Wire format after an upstream ALTER TABLE: to_json drops null
    # fields (ignoreNullFields default), so only the affected event
    # types carry the new columns — exactly how a mixed-binlog topic
    # looks mid-migration.
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                F.col("value").cast("string").alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
                F.when(
                    F.col("event_type") == "purchase", F.col("user_id") % 100
                ).alias("risk_score"),
                F.when(
                    F.col("event_type") == "click",
                    F.concat(F.lit("r"), (F.col("user_id") % 5).cast("string")),
                ).alias("source_region"),
            )
        ).alias("value"),
    )
    parsed = parse_debezium(wire, rescue=True)
    return parsed.groupBy(
        F.concat_ws(",", F.array_sort(F.map_keys(F.col("_rescued")))).alias(
            "rescued_keys"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.size("_rescued") > 0).cast("long")).alias("n_drifted"),
        F.coalesce(
            F.sum(F.element_at("_rescued", "risk_score").cast("long")), F.lit(0)
        ).alias("risk_sum"),
        F.countDistinct(F.element_at("_rescued", "source_region")).alias(
            "n_region_vals"
        ),
    )


@register(
    "cdc_multitable_routing",
    oracle="""
WITH acc AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
  FROM events WHERE event_type <> 'purchase'
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM acc
),
acc_cur AS (
  SELECT 'bank_accounts' AS tbl, user_id AS k, value AS v, CAST(n AS BIGINT) AS n
  FROM ranked WHERE rn = 1 AND __deleted = 'false'
),
txn AS (
  SELECT 'transactions' AS tbl, event_id AS k, value AS v, CAST(1 AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase'
)
SELECT * FROM acc_cur UNION ALL SELECT * FROM txn
""",
)
def cdc_multitable_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table capture routing — the general shape behind the
    reference's one-table allowlist (mysql-connector-config-clean.json:
    14-15 captures only bankdb.bank_accounts): ONE wire stream carries
    TWO source tables under Debezium's topic-per-table layout
    (dbserver1.bankdb.bank_accounts upserts keyed by user;
    dbserver1.bankdb.transactions append-only keyed by txn id, with its
    own payload schema), and the engine routes by topic, parses each
    branch with ITS table's StructType, and maintains each table's
    snapshot semantics — latest-live-per-key for the mutable table, all
    rows for the append-only one.  Output: both snapshots unioned as
    (tbl, k, v, n), full-hash-checked against a DuckDB recomputation.

    Plan: the wire frame is persisted once (one to_json pass); each
    table branch is filter + from_json + its own window/projection —
    the streaming twin (streaming/pipeline.py::stream_multitable_upsert)
    runs the same one-read-N-merges shape per micro-batch."""
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    is_txn = F.col("event_type") == "purchase"
    wire = tracked_persist(
        ev.select(
            F.when(is_txn, "dbserver1.bankdb.transactions")
            .otherwise("dbserver1.bankdb.bank_accounts")
            .alias("topic"),
            F.lit(0).alias("partition"),
            F.col("event_id").alias("offset"),
            F.when(
                is_txn,
                F.to_json(
                    F.struct(
                        F.col("event_id").alias("txn_id"),
                        F.col("user_id").alias("account_ref"),
                        F.col("value").alias("amount"),
                        F.col("ts").cast("string").alias("at"),
                    )
                ),
            )
            .otherwise(
                F.to_json(
                    F.struct(
                        F.col("user_id").alias("id"),
                        F.col("user_id").alias("user_id"),
                        F.col("value").cast("string").alias("account"),
                        F.col("ts").cast("string").alias("registered_at"),
                        F.when(F.col("event_type") == "error", "true")
                        .otherwise("false")
                        .alias("__deleted"),
                    )
                )
            )
            .alias("value"),
        )
    )
    # branch 1: the mutable table — standard change-event schema,
    # latest-live-per-key snapshot
    acc = parse_debezium(
        wire.filter(F.col("topic") == "dbserver1.bankdb.bank_accounts")
    )
    w = Window.partitionBy("id")
    acc_cur = (
        acc.withColumn("_mx", F.max("kafka_offset").over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(
            (F.col("kafka_offset") == F.col("_mx"))
            & (F.col("__deleted") == "false")
        )
        .select(
            F.lit("bank_accounts").alias("tbl"),
            F.col("id").alias("k"),
            F.col("account").cast("double").alias("v"),
            F.col("_n").cast("long").alias("n"),
        )
    )
    # branch 2: the append-only table — its own payload schema, no
    # upsert semantics (every txn row is current)
    txn = (
        wire.filter(F.col("topic") == "dbserver1.bankdb.transactions")
        .select(
            F.from_json(
                F.col("value"),
                "txn_id long, account_ref long, amount double, at string",
            ).alias("d")
        )
        .select(
            F.lit("transactions").alias("tbl"),
            F.col("d.txn_id").alias("k"),
            F.col("d.amount").alias("v"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    return acc_cur.unionByName(txn)


@register(
    "cdc_schema_evolution",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         value,
         ts AS registered_at,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted,
         CASE WHEN event_id > (SELECT t FROM t)
              THEN CASE WHEN user_id % 2 = 0 THEN 'checking' ELSE 'savings' END
         END AS account_type
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type,
         lag(__deleted) OVER w AS prev_deleted
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
),
carried AS (
  SELECT * EXCLUDE (prev_deleted),
         CASE WHEN change_type = 'DELETE'
               AND (prev_deleted IS NULL OR prev_deleted = 'true') THEN NULL
              ELSE last_value(CASE WHEN change_type = 'INSERT'
                                   THEN registered_at END
                              IGNORE NULLS)
                     OVER (PARTITION BY original_id ORDER BY kafka_offset
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         END AS original_registered_at
  FROM typed
)
SELECT original_id, kafka_offset, value, account_type, change_type,
       epoch_us(registered_at) AS change_timestamp_us,
       epoch_us(original_registered_at) AS original_registered_at_us
FROM carried
""",
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema evolution mid-feed — the reference-implied semantic
    Debezium's schema-history topic exists for
    (mysql-connector-config-clean.json:17,20): the upstream table is
    ALTERed at the feed's midpoint (``ALTER TABLE bank_accounts ADD
    account_type STRING``), so wire events after offset T carry the new
    column and events before it don't.  The engine learns the DDL and
    re-parses the ONE topic with the widened StructType
    (schemas.evolve_schema → parse_debezium(schema=...)): pre-ALTER
    history rows null-backfill the new column, post-ALTER rows carry the
    typed value, and change_type / registered_at-carry semantics are
    untouched — the full widened history is hash-checked against a
    DuckDB recomputation straight from ``events``, so a parse path that
    drops the column, backfills wrongly, or perturbs the carry fails.

    Plan: to_json → from_json(widened) in one projection, then the
    standard one-exchange history windows — schema evolution costs
    nothing at any scale because it is schema-on-read, not a rewrite."""
    from pyspark.sql.types import StringType, StructField

    from cdc_practice_spark.cdc.history import (
        with_change_type,
        with_registered_at_carry,
    )
    from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA, evolve_schema
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    # The wire after the mid-feed ALTER: to_json drops null fields, so
    # only post-ALTER events carry account_type — byte-for-byte how a
    # mixed-vintage binlog topic looks.
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                F.col("value").cast("string").alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
                F.when(
                    F.col("event_id") > t,
                    F.when(F.col("user_id") % 2 == 0, "checking").otherwise(
                        "savings"
                    ),
                ).alias("account_type"),
            )
        ).alias("value"),
    )
    evolved = evolve_schema(
        CHANGE_EVENT_SCHEMA, [StructField("account_type", StringType())]
    )
    parsed = parse_debezium(wire, schema=evolved)
    feed = parsed.select(
        "kafka_offset",
        F.col("id").alias("original_id"),
        F.col("account").cast("double").alias("value"),
        F.to_timestamp("registered_at").cast("timestamp_ntz").alias(
            "registered_at"
        ),
        "__deleted",
        "account_type",
    )
    carried = with_registered_at_carry(with_change_type(feed))
    return carried.select(
        "original_id",
        "kafka_offset",
        "value",
        "account_type",
        "change_type",
        _us("registered_at").alias("change_timestamp_us"),
        _us("original_registered_at").alias("original_registered_at_us"),
    )


@register(
    "cdc_schema_evolution_drop",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         CASE WHEN event_id <= (SELECT t FROM t) THEN value END AS value,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted
  FROM events
),
carried AS (
  SELECT *,
         last_value(value IGNORE NULLS)
           OVER (PARTITION BY original_id ORDER BY kafka_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS value_carried
  FROM feed
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY original_id
                            ORDER BY kafka_offset DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY original_id) AS BIGINT) AS n_events
  FROM carried
)
SELECT original_id, n_events, kafka_offset AS last_offset,
       value_carried, (__deleted = 'false') AS alive
FROM ranked WHERE rn = 1
""",
)
def cdc_schema_evolution_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema evolution, REMOVAL direction (r7, VERDICT ask #6):
    the upstream table DROPs ``account`` at the feed's midpoint, so wire
    events after offset T omit the field entirely (to_json drops nulls —
    byte-for-byte how the post-DDL binlog topic looks).  The engine
    RETIRES the column instead of narrowing the schema
    (schemas.retire_columns): the same from_json StructType parses both
    vintages — pre-drop rows carry the typed value, post-drop rows
    null-fill — and the current snapshot carries the retired column
    FORWARD per key (last_value IGNORE NULLS over the offset order), so
    a key whose last pre-drop value was v still reports v after any
    number of post-drop changes.  The full per-key state (event count,
    last offset, carried value, liveness) is hash-checked against a
    DuckDB recomputation straight from ``events`` — a parse path that
    narrows the schema, backfills the wrong direction, or breaks the
    carry fails the hash.

    Plan: one projection + one window over a single key exchange —
    retirement is schema-on-read metadata and costs nothing at scale."""
    from cdc_practice_spark.schemas import CHANGE_EVENT_SCHEMA, retire_columns
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                # the DROP: post-T events omit `account` on the wire
                F.when(F.col("event_id") <= t, F.col("value").cast("string"))
                .alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
            )
        ).alias("value"),
    )
    schema = retire_columns(CHANGE_EVENT_SCHEMA, ["account"])
    parsed = parse_debezium(wire, schema=schema)
    feed = parsed.select(
        "kafka_offset",
        F.col("id").alias("original_id"),
        F.col("account").cast("double").alias("value"),
        "__deleted",
    )
    w = Window.partitionBy("original_id").orderBy("kafka_offset")
    carried = feed.withColumn(
        "value_carried",
        F.last("value", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wd = Window.partitionBy("original_id")
    return (
        carried.withColumn("_mx", F.max("kafka_offset").over(wd))
        .withColumn("n_events", F.count(F.lit(1)).over(wd).cast("long"))
        .filter(F.col("kafka_offset") == F.col("_mx"))
        .select(
            "original_id",
            "n_events",
            F.col("kafka_offset").alias("last_offset"),
            "value_carried",
            (F.col("__deleted") == "false").alias("alive"),
        )
    )


@register(
    "cdc_schema_evolution_rename",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         value,
         event_id > (SELECT t FROM t) AND value IS NOT NULL AS from_renamed,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
)
SELECT original_id, kafka_offset, value AS balance, from_renamed, change_type
FROM typed
""",
)
def cdc_schema_evolution_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema evolution, RENAME direction (r8 — completes the
    ADD/DROP/RENAME triple, VERDICT r7 ask #5): the upstream table
    renames ``account`` → ``balance`` at the feed's midpoint, so wire
    events after offset T carry the NEW field name and the topic prefix
    still carries the old one (to_json drops nulls — byte-for-byte the
    mixed-vintage binlog topic Debezium's schema-history implies).  The
    engine maps old → new instead of re-reading either vintage
    (schemas.rename_columns: retire(old) + add(new, same type) + linking
    metadata): ONE from_json StructType parses both vintages, the reader
    unifies with coalesce(new, old) per schemas.renamed_pairs, and the
    unified column is VALUE-CONTINUOUS per key across the boundary —
    change-type dispatch (a lag window spanning the rename point) is
    untouched.  The full unified history is hash-checked against a
    DuckDB recomputation straight from ``events``: a parse path that
    loses either vintage, unifies in the wrong direction, or breaks the
    per-key window across the DDL fails the hash.

    Plan: one projection + one window over a single key exchange —
    rename is schema-on-read metadata, zero rewrite cost at any scale."""
    from cdc_practice_spark.cdc.history import with_change_type
    from cdc_practice_spark.schemas import (
        CHANGE_EVENT_SCHEMA,
        rename_columns,
        renamed_pairs,
    )
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                # the RENAME: pre-T events write `account`, post-T
                # events write `balance` — never both
                F.when(F.col("event_id") <= t, F.col("value").cast("string"))
                .alias("account"),
                F.when(F.col("event_id") > t, F.col("value").cast("string"))
                .alias("balance"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
            )
        ).alias("value"),
    )
    schema = rename_columns(CHANGE_EVENT_SCHEMA, {"account": "balance"})
    parsed = parse_debezium(wire, schema=schema)
    # reader-side unification straight from the schema's rename metadata
    # — no query-side knowledge of which columns were renamed
    ((new, old),) = renamed_pairs(schema)
    feed = parsed.select(
        "kafka_offset",
        F.col("id").alias("original_id"),
        F.coalesce(F.col(new), F.col(old)).cast("double").alias("balance"),
        F.col(new).isNotNull().alias("from_renamed"),
        "__deleted",
    )
    return with_change_type(feed).select(
        "original_id",
        "kafka_offset",
        "balance",
        "from_renamed",
        "change_type",
    )


@register(
    "cdc_schema_evolution_widen",
    oracle="""
WITH t AS (SELECT max(event_id) // 2 AS t FROM events),
feed AS (
  SELECT event_id AS kafka_offset,
         user_id AS original_id,
         CAST(round(value * 100, 0) AS BIGINT)
           + CASE WHEN event_id > (SELECT t FROM t)
                  THEN 5000000000 ELSE 0 END AS amount_cents,
         event_id > (SELECT t FROM t) AS post_ddl,
         CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
           AS __deleted
  FROM events
),
typed AS (
  SELECT *,
         CASE WHEN __deleted = 'true' THEN 'DELETE'
              WHEN lag(__deleted) OVER w IS NULL
                OR lag(__deleted) OVER w = 'true' THEN 'INSERT'
              ELSE 'UPDATE' END AS change_type
  FROM feed
  WINDOW w AS (PARTITION BY original_id ORDER BY kafka_offset)
)
SELECT original_id, kafka_offset, amount_cents, post_ddl, change_type
FROM typed
""",
)
def cdc_schema_evolution_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema evolution, type-WIDENING direction (r9 — VERDICT r8
    ask #3, completing ADD/DROP/RENAME/WIDEN): the upstream
    ``amount_cents INT`` column overflows (balances grow past 2^31−1
    cents) and the table is ALTERed to BIGINT at the feed's midpoint —
    wire events before offset T carry int32-representable numbers,
    events after carry values only int64 can hold (byte-for-byte the
    mixed-vintage binlog topic the DDL produces).  The engine re-types
    its ONE from_json StructType via schemas.widen_column: BOTH vintages
    parse through the widened type with no precision loss (every int32
    is an int64), per-key change-type dispatch spans the DDL boundary
    untouched, and nothing is reprocessed.  The full widened history is
    hash-checked against a DuckDB recomputation straight from ``events``
    — a parse path that kept the narrow type corrupts every post-DDL
    row (from_json nulls the overflow), which the hash catches; that
    narrow-parse failure mode is pinned in
    tests/test_schema_evolution.py (mixed-vintage parse, no silent
    narrowing).

    Plan: one projection + one window over a single key exchange —
    widening is schema-on-read metadata, zero rewrite cost at any
    scale."""
    from pyspark.sql.types import IntegerType, LongType, StructField

    from cdc_practice_spark.cdc.history import with_change_type
    from cdc_practice_spark.schemas import (
        CHANGE_EVENT_SCHEMA,
        evolve_schema,
        widen_column,
    )
    from cdc_practice_spark.sources.kafka import parse_debezium

    ev = load_table(spark, sf_dir, "events")
    t = _events_max_offset(spark, sf_dir) // 2
    wire = ev.select(
        F.lit("dbserver1.bankdb.bank_accounts").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.to_json(
            F.struct(
                F.col("user_id").alias("id"),
                F.col("user_id").alias("user_id"),
                F.col("value").cast("string").alias("account"),
                F.col("ts").cast("string").alias("registered_at"),
                F.when(F.col("event_type") == "error", "true")
                .otherwise("false")
                .alias("__deleted"),
                # the WIDEN: post-T amounts exceed int32 — the overflow
                # that motivated the upstream ALTER
                (
                    F.round(F.col("value") * 100, 0).cast("long")
                    + F.when(F.col("event_id") > t, F.lit(5000000000))
                    .otherwise(F.lit(0))
                ).alias("amount_cents"),
            )
        ).alias("value"),
    )
    # the feed's schema history: amount_cents was ADDed as INT before
    # this window, then ALTERed to BIGINT at T — the engine applies the
    # recorded DDL chain to its read schema
    pre_ddl = evolve_schema(
        CHANGE_EVENT_SCHEMA, [StructField("amount_cents", IntegerType())]
    )
    schema = widen_column(pre_ddl, "amount_cents", LongType())
    parsed = parse_debezium(wire, schema=schema)
    feed = parsed.select(
        "kafka_offset",
        F.col("id").alias("original_id"),
        "amount_cents",
        (F.col("kafka_offset") > t).alias("post_ddl"),
        "__deleted",
    )
    return with_change_type(feed).select(
        "original_id",
        "kafka_offset",
        "amount_cents",
        "post_ddl",
        "change_type",
    )


# SCD2 oracle CTE: versions with half-open [valid_from, valid_to) bounds —
# mirrors cdc/scd2.py::build_scd2 (one lead() over the feed's key/offset sort).
SCD2_CTE = """
led AS (
  SELECT *,
         lead(registered_at) OVER (PARTITION BY original_id
                                   ORDER BY kafka_offset) AS next_ts
  FROM feed
),
dim AS (
  SELECT original_id, value, event_type,
         registered_at AS valid_from,
         next_ts AS valid_to,
         next_ts IS NULL AS is_current,
         kafka_offset AS version_offset
  FROM led
  WHERE __deleted = 'false'
)
"""


@register(
    "cdc_scd2_dimension",
    oracle=f"""
WITH {FEED_CTE},
{SCD2_CTE}
SELECT original_id, value, event_type,
       epoch_us(valid_from) AS valid_from_us,
       epoch_us(valid_to) AS valid_to_us,
       is_current,
       version_offset
FROM dim
""",
)
def cdc_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension over the change feed (cdc/scd2.py): one row per
    live VERSION with [valid_from, valid_to) validity — the temporal view
    the reference's SCD-1 pair (simple_kafka_etl.py:97-175) cannot answer.
    Rides the same single (key, offset) exchange as history/current."""
    from cdc_practice_spark.cdc.scd2 import build_scd2

    dim = build_scd2(_feed(spark, sf_dir))
    return dim.select(
        "original_id",
        "value",
        "event_type",
        _us("valid_from").alias("valid_from_us"),
        _us("valid_to").alias("valid_to_us"),
        "is_current",
        "version_offset",
    )


@register(
    "cdc_scd2_asof_join",
    oracle=f"""
WITH {FEED_CTE},
{SCD2_CTE},
probes AS (
  SELECT event_id AS probe_id, user_id, ts AS probe_ts
  FROM events
  WHERE event_id % 7 = 0
)
SELECT p.probe_id,
       p.user_id,
       epoch_us(p.probe_ts) AS probe_ts_us,
       d.value AS dim_value,
       d.event_type AS dim_event_type,
       d.version_offset
FROM probes p
LEFT JOIN dim d
  ON p.user_id = d.original_id
 AND d.valid_from <= p.probe_ts
 AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
""",
)
def cdc_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: probe rows pick the dimension version
    valid AT their own timestamp (cdc/scd2.py::asof_join_scd2).  Key
    equality drives a hash-partitioned sort-merge join; the interval check
    is a residual predicate — no range-only join, no row amplification
    (intervals per key are disjoint; probes in a delete-gap LEFT-miss)."""
    from cdc_practice_spark.cdc.scd2 import asof_join_scd2, build_scd2

    dim = build_scd2(_feed(spark, sf_dir))
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_id") % 7 == 0).select(
        F.col("event_id").alias("probe_id"),
        F.col("user_id"),
        F.col("ts").alias("probe_ts"),
    )
    joined = asof_join_scd2(probes, dim, fact_key="user_id", fact_ts="probe_ts")
    return joined.select(
        "probe_id",
        "user_id",
        _us("probe_ts").alias("probe_ts_us"),
        F.col("value").alias("dim_value"),
        F.col("event_type").alias("dim_event_type"),
        "version_offset",
    )


@register(
    "cdc_incremental_mv",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM cur
GROUP BY event_type
""",
)
def cdc_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (cdc/incremental.py):
    the per-event_type (count, sum(value)) aggregate of the CURRENT
    state as of the feed's midpoint offset, maintained through the
    second half with retract/insert deltas.  The oracle recomputes from
    scratch over the FULL feed, so any drift in the delta algebra
    hash-fails.  Runs the fused one-pass form (both halves live in one
    feed here, so per-key facts come from a single aggregation); the
    separate-frames form — stored base, O(delta + touched keys) refresh
    — is delta_apply_mv, property-tested at arbitrary split points.
    The midpoint is a driver-side scalar (one max() job — same class as
    the ANN query-vector collects)."""
    from cdc_practice_spark.cdc.incremental import delta_apply_mv_onepass

    # dedup-invariant consumer (first touch = per-key max_by) → the
    # coord-dedup-free feed: map-side-combinable key exchange
    feed = _feed_agg(spark, sf_dir)
    # the split point only needs the column's MAX — a stats-catalog fact
    # (ANALYZE keeps per-column min/max), memoized like every other
    # size/stats decision in plans/hints.py
    t = _events_max_offset(spark, sf_dir) // 2
    # fused single-pass form (r5): base MV + retract/insert legs from ONE
    # key-partitioned aggregation — two exchanges instead of six.  The
    # separate-frames production form (stored base + delta batch,
    # delta_apply_mv) is exercised by the split-sweep property tests and
    # the streaming maintained-MV sink.
    maintained = delta_apply_mv_onepass(feed, t, "event_type")
    return maintained.select(
        "event_type",
        "n_rows",
        F.round(
            F.col("sum_cents").cast("decimal(38,0)")
            / F.lit(100).cast("decimal(19,0)"),
            2,
        )
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "cdc_incremental_minmax_mv",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(round(min(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS min_value,
       CAST(round(max(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS max_value
FROM cur
GROUP BY event_type
""",
)
def cdc_incremental_minmax_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MIN/MAX maintenance — the NON-invertible aggregate
    (cdc/incremental.py::delta_apply_minmax_mv): unlike count/sum, a
    retraction that removes a group's stored extreme cannot be undone by
    signed arithmetic; the maintained path re-derives ONLY the endangered
    groups from a group-key-prunable rescan, keeping every other group on
    O(delta) math.  Same split-at-midpoint harness as cdc_incremental_mv;
    the oracle recomputes from scratch over the full feed."""
    from cdc_practice_spark.cdc.incremental import delta_apply_minmax_mv, minmax_mv
    from cdc_practice_spark.plans.cache import tracked_persist

    feed = _feed(spark, sf_dir)
    t = _events_max_offset(spark, sf_dir) // 2
    base_feed = feed.filter(F.col("kafka_offset") <= t)
    delta_feed = feed.filter(F.col("kafka_offset") > t)
    base_current = tracked_persist(build_current(base_feed))
    maintained = delta_apply_minmax_mv(
        base_current, minmax_mv(base_current, "event_type"), delta_feed, "event_type"
    )

    def _money(c: str) -> F.Column:
        return (
            F.round(
                F.col(c).cast("decimal(38,0)") / F.lit(100).cast("decimal(19,0)"), 2
            )
            .cast("double")
        )

    return maintained.select(
        "event_type",
        "n_rows",
        _money("min_cents").alias("min_value"),
        _money("max_cents").alias("max_value"),
    )


@register(
    "cdc_incremental_topk_mv",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
),
scored AS (
  SELECT event_type,
         CAST(round(CAST(value AS DECIMAL(12,2)) * 100, 0) AS BIGINT) AS cents,
         original_id
  FROM cur
),
tk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cents DESC, original_id) AS rnk
  FROM scored
)
SELECT event_type,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(round(CAST(cents AS DECIMAL(38,0)) / 100, 2) AS DOUBLE) AS value,
       original_id
FROM tk WHERE rnk <= 3
""",
)
def cdc_incremental_topk_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained per-group TOP-K view (cdc/incremental.py
    ::delta_apply_topk_mv) — the warehouse's q2_topk_changes shape under
    retraction.  Top-3 (value desc, key asc) per event_type is
    materialized at the feed's midpoint and maintained through the
    second half: inserts merge into the stored prefix with O(k + delta)
    array math; only groups whose retractions reach the stored kth
    value re-derive, via a group-key-prunable rescan.  The oracle
    recomputes the top-3 from scratch over the full feed, so a stale
    prefix or a missed endangerment hash-fails.  Runs the fused
    one-feed form (both halves live in one feed here — per-key facts
    from ONE max_by aggregation, half the exchanges); the
    separate-frames production form is delta_apply_topk_mv,
    property-tested at arbitrary split points."""
    from cdc_practice_spark.cdc.incremental import delta_apply_topk_mv_onepass

    # dedup-invariant consumer (first touch = per-key max_by) → the
    # coord-dedup-free feed: map-side-combinable key exchange
    feed = _feed_agg(spark, sf_dir)
    t = _events_max_offset(spark, sf_dir) // 2
    maintained = delta_apply_topk_mv_onepass(feed, t, "event_type", 3)
    ex = maintained.select(
        "event_type", F.posexplode("topk").alias("pos", "e")
    )
    return ex.select(
        "event_type",
        (F.col("pos") + 1).cast("long").alias("rnk"),
        F.round(
            (-F.col("e.nc")).cast("decimal(38,0)") / F.lit(100).cast("decimal(19,0)"),
            2,
        )
        .cast("double")
        .alias("value"),
        F.col("e.id").alias("original_id"),
    )


@register(
    "cdc_incremental_distinct_mv",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
)
SELECT event_type,
       count(*) AS n_rows,
       count(DISTINCT props_k) AS n_distinct
FROM cur
GROUP BY event_type
""",
)
def cdc_incremental_distinct_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained COUNT(DISTINCT) view (cdc/incremental.py
    ::delta_apply_distinct_mv) — the support-counted non-invertible
    aggregate: per event_type, the exact distinct count of props_k over
    the current state.  The MV plus its (group, value) support table are
    materialized at the feed's midpoint and maintained through the
    second half; the distinct count moves only when a support count
    crosses zero (born/died), detected with O(touched pairs) point
    reads.  The oracle recomputes COUNT(DISTINCT) from scratch over the
    full feed, so a missed zero-crossing or an unretracted pair
    hash-fails."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_distinct_mv,
        distinct_mv,
        support_mv,
    )
    from cdc_practice_spark.plans.cache import tracked_persist

    feed = _feed(spark, sf_dir)
    t = _events_max_offset(spark, sf_dir) // 2
    base_feed = feed.filter(F.col("kafka_offset") <= t)
    delta_feed = feed.filter(F.col("kafka_offset") > t)
    base_current = tracked_persist(build_current(base_feed))
    maintained = delta_apply_distinct_mv(
        base_current,
        support_mv(base_current, "event_type", "props_k"),
        distinct_mv(base_current, "event_type", "props_k"),
        delta_feed,
        "event_type",
        "props_k",
    )
    return maintained.select("event_type", "n_rows", "n_distinct")


@register(
    "cdc_gdpr_erasure",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
cur AS (
  SELECT * FROM ranked WHERE rn = 1 AND __deleted = 'false'
),
surviving AS (
  SELECT * FROM cur WHERE original_id % 97 <> 0
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
FROM surviving
GROUP BY event_type
""",
)
def cdc_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten as RETRACTION through the standard
    maintenance path: the erasure set (every 97th user) becomes a batch
    of synthetic DELETE events appended after the feed's end, and the
    per-group (count, sum) MV is refreshed with the SAME delta_apply_mv
    every other change batch uses — erasure is not a special code path,
    it is a delta.  Cost is O(|erasure set| + touched groups), never a
    corpus rewrite of the aggregate side; the snapshot rewrite itself
    rides the bucketed MERGE (only touched buckets).  The oracle
    recomputes the aggregate over the corpus with the erased users
    excluded, so an unretracted contribution hash-fails."""
    from cdc_practice_spark.cdc.incremental import current_mv, delta_apply_mv
    from cdc_practice_spark.plans.cache import tracked_persist

    feed = _feed(spark, sf_dir)
    mx = _events_max_offset(spark, sf_dir)
    current = tracked_persist(build_current(feed))
    erase = current.filter(F.col("original_id") % 97 == 0).select(
        "original_id",
        "event_type",
        "value",
        F.lit("true").alias("__deleted"),
        (F.lit(mx) + 1 + F.col("original_id")).alias("kafka_offset"),
    )
    maintained = delta_apply_mv(
        current, current_mv(current, "event_type"), erase, "event_type"
    )
    return maintained.select(
        "event_type",
        "n_rows",
        F.round(
            F.col("sum_cents").cast("decimal(38,0)")
            / F.lit(100).cast("decimal(19,0)"),
            2,
        )
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "cdc_incremental_join_view",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
),
a_cur AS (
  SELECT original_id AS user_id, original_id % 20 AS bucket,
         CAST(round(CAST(value AS DECIMAL(12,2)), 2) AS DOUBLE) AS value_a
  FROM ranked WHERE rn = 1 AND __deleted = 'false'
),
b_ranked AS (
  SELECT original_id % 20 AS bucket,
         CAST(round(CAST(value AS DECIMAL(12,2)), 2) AS DOUBLE) AS value_b,
         row_number() OVER (PARTITION BY original_id % 20
                            ORDER BY kafka_offset DESC) AS rn
  FROM feed WHERE event_type = 'purchase'
),
b_cur AS (SELECT bucket, value_b FROM b_ranked WHERE rn = 1)
SELECT a.bucket, a.user_id, a.value_a, b.value_b,
       CAST(count(*) AS BIGINT) AS cnt
FROM a_cur a JOIN b_cur b ON a.bucket = b.bucket
GROUP BY 1, 2, 3, 4
""",
)
def cdc_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintained JOIN view (cdc/incremental.py, the DBSP
    bilinear product rule ΔV = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB): A = the user
    current-state table, B = last-purchase-per-bucket (bucket =
    user % 20), V = A ⋈ B on bucket as a counted multiset.  The view is
    materialized at the feed's midpoint and maintained through the
    second half with SIGNED deltas on BOTH sides — the oracle recomputes
    A_final ⋈ B_final from scratch, so a missing cross term or an
    unretracted old row hash-fails."""
    from cdc_practice_spark.cdc.incremental import (
        delta_apply_join_view,
        signed_delta_current,
    )
    from cdc_practice_spark.plans.cache import tracked_persist

    feed = _feed(spark, sf_dir)
    t = _events_max_offset(spark, sf_dir) // 2

    def val(c: str) -> F.Column:
        return F.round(F.col(c).cast("decimal(12,2)"), 2).cast("double")

    def a_frames(f: DataFrame) -> DataFrame:
        cur = build_current(f)
        return cur.select(
            F.col("original_id"),
            (F.col("original_id") % 20).alias("bucket"),
            F.col("original_id").alias("user_id"),
            val("value").alias("value_a"),
        )

    feed_b = feed.filter(F.col("event_type") == "purchase").select(
        "kafka_offset",
        (F.col("original_id") % 20).alias("bucket"),
        val("value").alias("value_b"),
        "__deleted",  # always 'false' for purchases — B never deletes
    )

    def b_current(fb: DataFrame) -> DataFrame:
        w = Window.partitionBy("bucket")
        return (
            fb.withColumn("_mx", F.max("kafka_offset").over(w))
            .filter(F.col("kafka_offset") == F.col("_mx"))
            .select("bucket", "value_b")
        )

    base_feed = feed.filter(F.col("kafka_offset") <= t)
    a_old = tracked_persist(a_frames(base_feed))
    b_old = tracked_persist(b_current(feed_b.filter(F.col("kafka_offset") <= t)))
    view_old = (
        a_old.drop("original_id")
        .join(b_old, on="bucket")
        .groupBy("bucket", "user_id", "value_a", "value_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # signed deltas of both sides from the second half of the feed
    da = signed_delta_current(
        a_old.withColumnRenamed("original_id", "_k"),
        feed.filter(F.col("kafka_offset") > t)
        .withColumnRenamed("original_id", "_k")
        .withColumn("bucket", F.col("_k") % 20)
        .withColumn("user_id", F.col("_k"))
        .withColumn("value_a", val("value")),
        cols=["bucket", "user_id", "value_a"],
        key="_k",
    )
    db = signed_delta_current(
        b_old.withColumn("_k", F.col("bucket")),
        feed_b.filter(F.col("kafka_offset") > t).withColumn(
            "_k", F.col("bucket")
        ),
        cols=["bucket", "value_b"],
        key="_k",
    )
    maintained = delta_apply_join_view(
        view_old,
        a_old.drop("original_id"),
        b_old,
        da,
        db,
        on="bucket",
    )
    return maintained.select(
        "bucket", "user_id", "value_a", "value_b", F.col("cnt").cast("long").alias("cnt")
    )


_TXN_SIZE = 5  # events per simulated source transaction (event_id div 5)


@register(
    "cdc_txn_boundary_apply",
    oracle=f"""
WITH bounds AS (
  SELECT CAST(floor(max(event_id) * 0.8) AS BIGINT) + 2 AS w FROM events
),
declared AS (
  SELECT event_id // {_TXN_SIZE} AS txn, count(*) AS c FROM events GROUP BY 1
),
observed AS (
  SELECT event_id // {_TXN_SIZE} AS txn, count(*) AS c
  FROM events, bounds WHERE event_id <= w GROUP BY 1
),
complete AS (
  SELECT o.txn FROM observed o JOIN declared d USING (txn) WHERE o.c = d.c
),
applied_events AS (
  SELECT e.* FROM events e, bounds
  WHERE e.event_id <= w
    AND e.event_id // {_TXN_SIZE} IN (SELECT txn FROM complete)
),
{FEED_CTE.replace("FROM events", "FROM applied_events")},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       props_k,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def cdc_txn_boundary_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION-boundary-consistent CDC apply — the consumer never
    exposes a half-applied source transaction.  Debezium publishes
    transaction metadata (txn id per event + an END record carrying the
    event count per txn); a consistency-preserving warehouse apply
    buffers events until their transaction's END arrives and applies
    whole transactions only.  The reference's per-event loop
    (simple_kafka_etl.py:64-92) has no such gate — a crash mid-txn
    leaves the snapshot torn; this closes that hole.

    Simulation on the fixture: txn = event_id div 5 and the feed is
    truncated at offset w = floor(0.8 * max) + 2 — off a transaction
    boundary by construction, so the tail transaction is genuinely cut
    mid-way and must NOT reach the snapshot.  "Complete"
    is decided the general way — observed per-txn count == declared
    count from the transaction metadata (NOT "txn ends before w", which
    only holds for prefix truncation on a single partition): the same
    rule works for multi-partition feeds where per-partition prefixes
    interleave transactions.

    Scale shape: the declared-count table stands in for Debezium's
    transaction topic.  Declared and observed counts are each one
    map-side-combinable groupBy keyed on txn = offset div 5 — ALIGNED
    with the feed's offset partitioning — and land hash-partitioned on
    txn, so their equality join is exchange-free; the complete-txn
    semi join shuffles on the same key (AQE broadcasts it when small).
    Downstream is the standard cdc_current_snapshot pipeline
    unchanged.

    r10 (VERDICT r9 watch item — 4.35× vs DuckDB at sf1): the general
    gate (filter_complete_txns) aggregates observed and declared from
    two separate frames, which here both derive from ONE events scan —
    so the query computes both per-txn counts in a single conditional
    aggregation (declared = count(*), observed = count where captured),
    one scan instead of two; the general two-frame gate remains for
    feeds whose transaction topic is a genuinely separate stream."""
    events = load_table(spark, sf_dir, "events")
    txn = F.expr(f"event_id div {_TXN_SIZE}")
    w = events.agg(
        (F.floor(F.max("event_id") * 0.8).cast("long") + 2).alias("w")
    )
    counts = (
        events.crossJoin(F.broadcast(w))
        .groupBy(txn.alias("txn"))
        .agg(
            F.count(F.lit(1)).alias("declared_c"),
            F.count(F.when(F.col("event_id") <= F.col("w"), 1)).alias(
                "observed_c"
            ),
        )
    )
    complete = counts.filter(
        F.col("observed_c") == F.col("declared_c")
    ).select("txn")
    trunc = events.crossJoin(F.broadcast(w)).filter(
        F.col("event_id") <= F.col("w")
    )
    applied = trunc.join(
        complete, txn == complete["txn"], "left_semi"
    ).drop("w")
    cur = build_current(change_feed_from_events(applied))
    return cur.select(
        "original_id",
        "user_id",
        "value",
        "event_type",
        "props_k",
        _us("original_registered_at").alias("original_registered_at_us"),
        _us("last_updated_at").alias("last_updated_at_us"),
    )


@register(
    "cdc_snapshot_handoff",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       props_k,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def cdc_snapshot_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot → binlog-tail BOOTSTRAP (Debezium snapshot mode,
    cdc/handoff.py): snapshot the warehouse state at position
    S = 60% of the feed, then hand off to a tail re-read from an
    EARLIER position G = 50% — the overlap (G, S] replays changes the
    snapshot already contains and must be discarded per-event, the
    first tail event of a snapshotted key must classify UPDATE (seeded
    existence probe), and the first-INSERT carry must be seeded from
    snapshot rows.  The oracle is the strongest possible: the handoff
    result must FULL-HASH equal the cdc_current_snapshot built over the
    complete feed in one pass — any resurrection, regression, or carry
    leak hash-fails.

    S/G are derived from max(offset) here to scale with the fixture; a
    real connector gets S from its snapshot metadata and G from the
    consumer group's rewind — both O(1) inputs."""
    from cdc_practice_spark.cdc import snapshot_handoff_current

    feed = _feed(spark, sf_dir)
    max_off = feed.agg(F.max("kafka_offset").alias("m")).head().m
    s_off, g_off = int(max_off * 0.6), int(max_off * 0.5)
    snap = build_current(feed.filter(F.col("kafka_offset") <= s_off))
    tail = feed.filter(F.col("kafka_offset") > g_off)  # overlapping re-read
    cur = snapshot_handoff_current(snap, tail, s_off)
    return cur.select(
        "original_id",
        "user_id",
        "value",
        "event_type",
        "props_k",
        _us("original_registered_at").alias("original_registered_at_us"),
        _us("last_updated_at").alias("last_updated_at_us"),
    )


@register(
    "cdc_multipartition_snapshot",
    oracle=f"""
WITH {FEED_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY original_id
                               ORDER BY kafka_offset DESC) AS rn
  FROM carried
)
SELECT original_id,
       original_id AS user_id,
       value,
       event_type,
       props_k,
       epoch_us(original_registered_at) AS original_registered_at_us,
       epoch_us(registered_at) AS last_updated_at_us
FROM ranked
WHERE rn = 1 AND __deleted = 'false'
""",
)
def cdc_multipartition_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED-topic semantics (S6): a real Debezium topic is
    key-partitioned — each PK's events land in ONE partition with
    PARTITION-LOCAL offsets, and offsets of different partitions
    interleave arbitrarily.  The fixture's single global offset hides
    that; here the feed is re-sharded into 4 partitions by key hash
    (Kafka's keyed routing), each with its own dense offset sequence,
    and the snapshot is built from the partition-local coordinates
    alone — no global order exists or is needed, because every
    operator is per-key and a key's partition-local offsets are
    monotone in event order (SURVEY.md §4.1: the reference relied on a
    single consumer for total order, but all of its operators are
    per-key).  Oracle: full-hash identity with the single-partition
    cdc_current_snapshot.

    Scale shape: the re-shard is one row_number window per partition
    (at 100 TB, partition-local offsets ARRIVE from Kafka — no window
    at all); downstream is the standard one-exchange snapshot."""
    feed = _feed(spark, sf_dir)
    part = F.pmod(F.xxhash64(F.col("original_id")), F.lit(4)).cast("int")
    wpart = Window.partitionBy("_kpart").orderBy("kafka_offset")
    # swap in partition-local coordinates (the wire truth on a
    # partitioned topic) and drop the global ordinal entirely
    feed = (
        feed.withColumn("_kpart", part)
        .withColumn("_loc", (F.row_number().over(wpart) - 1).cast("long"))
        .drop("kafka_offset", "kafka_partition")
        .withColumnRenamed("_loc", "kafka_offset")
        .withColumnRenamed("_kpart", "kafka_partition")
    )
    cur = build_current(feed)
    return cur.select(
        "original_id",
        "user_id",
        "value",
        "event_type",
        "props_k",
        _us("original_registered_at").alias("original_registered_at_us"),
        _us("last_updated_at").alias("last_updated_at_us"),
    )
