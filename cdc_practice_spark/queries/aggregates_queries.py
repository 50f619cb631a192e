"""Statistical aggregates: exact percentiles (oracle — Spark
``percentile`` and DuckDB ``quantile_cont`` share the linear-interpolation
definition) and sketch-based approximate distinct (HLL — rows-only with a
tolerance test, since a sketch has no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_practice_spark.queries.registry import register
from cdc_practice_spark.session import load_table


@register(
    "percentile_price_stats",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(avg(l_quantity), 6) AS mean_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def percentile_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles + stddev.  percentile() is a sort-based
    aggregate per group — at 100 TB prefer approx_percentile (t-digest)
    unless exactness is required; both surfaces exist here (see
    approx_distinct_parts for the sketch tier)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       TRUE AS parts_within_tol,
       TRUE AS suppliers_within_tol
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch per order status — the
    constant-memory cardinality tier for 100 TB (exact distinct shuffles
    every key; HLL merges fixed-size sketches map-side).

    An HLL estimate can never hash-match a SQL twin raw, so the query
    emits the DECISION instead: the exact counts (both engines agree)
    plus a boolean per sketch — |approx − exact| / exact ≤ 0.05 — that
    the oracle asserts as TRUE.  A sketch drifting out of tolerance
    flips the boolean and fails the hash compare, which is exactly the
    regression the rows-only check could never catch.  (rsd=0.02, so
    the 5%% bound holds with wide margin; also tolerance-tested in
    tests/test_aggregates.py.)"""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_suppliers"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("exact_suppliers"),
    )
    tol = lambda a, e: (
        F.abs(F.col(a).cast("double") - F.col(e).cast("double"))
        / F.col(e).cast("double")
        <= F.lit(0.05)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        tol("approx_parts", "exact_parts").alias("parts_within_tol"),
        tol("approx_suppliers", "exact_suppliers").alias("suppliers_within_tol"),
    )


@register(
    "histogram_order_totals",
    oracle="""
WITH rng AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT CAST(CASE WHEN o_totalprice >= hi THEN 20
            ELSE floor((o_totalprice - lo) * 20.0 / (hi - lo)) + 1 END
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)), 2)
            AS DOUBLE) AS total
FROM orders, rng
GROUP BY bucket
""",
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width numeric histogram via width_bucket — the profiling
    primitive behind distribution dashboards.  The min/max range is one
    tiny aggregate broadcast back (scalar-subquery shape); the bucketing
    itself is a pure projection feeding a 21-key aggregate: one scan,
    one map-side-combined shuffle."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    rng = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        orders.crossJoin(F.broadcast(rng))
        .select(
            # same arithmetic as the oracle, literally — width_bucket's
            # internal formula could differ by an ulp at bucket edges
            F.when(F.col("o_totalprice") >= F.col("hi"), F.lit(20))
            .otherwise(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    * 20.0
                    / (F.col("hi") - F.col("lo"))
                )
                + 1
            )
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast(
                    "decimal(18,2)"
                ),
                2,
            )
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "heavy_hitters_lang",
    oracle="""
WITH t AS (SELECT count(*) AS n FROM documents WHERE lang IS NOT NULL)
SELECT lang,
       CAST(count(*) AS BIGINT) AS exact_count,
       TRUE AS in_candidates
FROM documents, t
WHERE lang IS NOT NULL
GROUP BY lang, t.n
HAVING count(*) * 4 > t.n
ORDER BY lang
""",
)
def heavy_hitters_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters under the oracle gate (operators/
    sketches.py): a capacity-3 summary per partition (O(k) memory,
    vectorized per Arrow batch), one ≤ partitions·k-row merge shuffle,
    final decrement on the index-sized candidate list.  The MG theorem
    guarantees every item with true frequency > n/(k+1) survives any
    merge tree — so the query emits the exact heavy hitters (both
    engines agree: count·4 > n) with the sketch-membership DECISION per
    item; a summary that drops a guaranteed item flips the boolean and
    fails the hash.  Exact top-frequency at 100 TB shuffles every
    distinct key; this shuffles ≤ partitions·k rows."""
    from cdc_practice_spark.operators.sketches import misra_gries_candidates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    cands, n = misra_gries_candidates(docs, "lang", k=3)
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .filter(F.col("exact_count") * 4 > F.lit(n))
        .select(
            "lang",
            "exact_count",
            F.col("lang").isin([str(c) for c in cands]).alias("in_candidates"),
        )
        .orderBy("lang")
    )


@register(
    "approx_quantiles_price",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
             AS DOUBLE), 4) AS exact_p50,
       round(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)
             AS DOUBLE), 4) AS exact_p95,
       TRUE AS p50_within_rank_eps,
       TRUE AS p95_within_rank_eps
FROM orders
""",
)
def approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (Spark's percentile_approx /
    Greenwald-Khanna-style summary) — the constant-memory companion to
    exact `percentile`, which needs a per-group sort at 100 TB.  The
    sketch's guarantee is on RANK (accuracy=100 → rank error ≤ n/100),
    so the DECISION emitted is rank-based: the approximate p50 must lie
    between the exact p48 and p52 values (p93/p97 for the tail) — a
    ±0.02 band that strictly dominates the ±0.01 guarantee plus the
    one-rank slack of comparing a sketch's DATA VALUE against
    interpolated percentiles (at n=1500 a ±0.01 band is exactly the
    guarantee with zero slack — it flipped at sf0.001) — both
    engines agree on the exact percentiles (linear interpolation:
    Spark `percentile` = DuckDB percentile_cont), and the booleans
    assert the sketch holds its bound."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile_approx(o_totalprice, 0.5, 100)").alias("a50"),
        F.expr("percentile_approx(o_totalprice, 0.95, 100)").alias("a95"),
        F.expr("percentile(o_totalprice, 0.48)").alias("lo50"),
        F.expr("percentile(o_totalprice, 0.52)").alias("hi50"),
        F.expr("percentile(o_totalprice, 0.93)").alias("lo95"),
        F.expr("percentile(o_totalprice, 0.97)").alias("hi95"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("exact_p95"),
    )
    return agg.select(
        "n",
        "exact_p50",
        "exact_p95",
        F.col("a50").between(F.col("lo50"), F.col("hi50")).alias(
            "p50_within_rank_eps"
        ),
        F.col("a95").between(F.col("lo95"), F.col("hi95")).alias(
            "p95_within_rank_eps"
        ),
    )


@register(
    "countmin_user_freq",
    oracle="""
WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
seeds AS (SELECT unnest([0, 1, 2, 3]) AS seed),
cm AS (
  SELECT seed,
         CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':cm' || CAST(seed AS VARCHAR)), 1, 15)
              AS BIGINT) % 256 AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM ev CROSS JOIN seeds
  GROUP BY 1, 2
),
probes AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7, 8, 9]) AS user_id),
pb AS (
  SELECT p.user_id, s.seed,
         CAST(CAST('0x' || substring(md5(CAST(p.user_id AS VARCHAR) || ':cm' || CAST(s.seed AS VARCHAR)), 1, 15)
              AS BIGINT) % 256 AS INTEGER) AS bucket
  FROM probes p CROSS JOIN seeds s
),
est AS (
  SELECT pb.user_id, CAST(min(coalesce(cm.c, 0)) AS BIGINT) AS est_freq
  FROM pb LEFT JOIN cm ON cm.seed = pb.seed AND cm.bucket = pb.bucket
  GROUP BY pb.user_id
),
tru AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_freq
  FROM ev GROUP BY user_id
)
SELECT e.user_id,
       coalesce(t.true_freq, 0) AS true_freq,
       e.est_freq,
       e.est_freq >= coalesce(t.true_freq, 0) AS never_underestimates
FROM est e LEFT JOIN tru t ON t.user_id = e.user_id
""",
)
def countmin_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (operators/sketches.py):
    a 4×256-counter sketch built by ONE exploded aggregation (8 KB for
    ANY input size — the constant-memory answer to 'how often does this
    key occur' that exact needs a full-key shuffle for), probed for ten
    fixed user ids against exact counts.  ``never_underestimates`` is
    the CM one-sided guarantee as a checked decision; both engines build
    the identical sketch (md5-portable hash), so estimates hash-compare
    exactly."""
    from cdc_practice_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sketch = count_min_build(ev, "user_id", depth=4, width=256)
    probes = spark.range(10).select(F.col("id").alias("user_id"))
    est = count_min_estimate(sketch, probes, "user_id", depth=4, width=256)
    tru = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_freq"))
    return (
        est.join(tru, on="user_id", how="left")
        .select(
            "user_id",
            F.coalesce("true_freq", F.lit(0)).alias("true_freq"),
            "est_freq",
            (F.col("est_freq") >= F.coalesce("true_freq", F.lit(0))).alias(
                "never_underestimates"
            ),
        )
    )


@register(
    "stats_regression_suite",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(regr_slope(value, (epoch_us(ts) - 1704067200000000) / 1000000.0)
             AS DOUBLE), 6) AS slope_per_s,
       round(CAST(regr_intercept(value, (epoch_us(ts) - 1704067200000000) / 1000000.0)
             AS DOUBLE), 4) AS intercept,
       round(CAST(corr(value, user_id) AS DOUBLE), 6) AS corr_value_user,
       round(CAST(covar_samp(value, user_id) AS DOUBLE), 4) AS covar_value_user,
       round(CAST(stddev_samp(value) AS DOUBLE), 6) AS sd_value,
       -- DuckDB skewness is SAMPLE-corrected; Spark's is population —
       -- convert: g1 = G1 * (n-2) / sqrt(n*(n-1))
       round(CAST(skewness(value) * (count(*) - 2)
                  / sqrt(count(*) * (count(*) - 1.0)) AS DOUBLE), 6)
         AS skew_value
FROM events
GROUP BY event_type
""",
)
def stats_regression_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: per-group OLS trend (regr_slope /
    regr_intercept — the model-per-group pattern, closed-form so it
    stays a single JVM partial-aggregatable pass, no ML library, no
    Python), correlation, sample covariance, stddev, skewness.  All are
    algebraic aggregates: partials combine associatively, so the plan is
    one map-side-combined exchange regardless of group skew — the same
    scale shape as sum/count.  Rounded to 6/4 dp so cross-engine float
    summation-order noise stays below the hash granularity."""
    ev = load_table(spark, sf_dir, "events")
    # x centered on 2024-01-01: raw epoch seconds (~1.7e9) put the
    # intercept extrapolation 10 orders of magnitude from the data —
    # catastrophic cancellation made two engines disagree at 4 dp
    x = (
        F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(1704067200000000)
    ) / F.lit(1000000.0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope_per_s"),
        F.round(F.regr_intercept(F.col("value"), x), 4).alias("intercept"),
        F.round(F.corr("value", "user_id"), 6).alias("corr_value_user"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("covar_value_user"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.skewness("value"), 6).alias("skew_value"),
    )
