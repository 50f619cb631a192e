"""A/B: degree-oriented triangle counting vs the naive id-oriented wedge
join, on a hub-skewed graph — the shape that motivates the orientation.

Graph: one hub (id 0) with H spokes, plus R disjoint triangles.  Id
orientation points every hub edge OUT of the hub (id 0 is the minimum),
so the naive wedge join enumerates C(H, 2) hub wedges that can never
close.  Degree orientation points every hub edge INTO the hub — zero
hub wedges — while finding the same R+0 triangles.

Usage: python tools/ab_triangles.py [H] [R]   (defaults 20000, 1000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_practice_spark.operators.triangles import triangles
from cdc_practice_spark.plans.cache import release_tracked
from cdc_practice_spark.session import get_spark


def naive_triangle_count(edges):
    """Id-oriented 3-way join — the plan a SQL engine runs for the
    textbook query (edges already canonical u < v)."""
    e1 = edges.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = edges.select(F.col("u").alias("x"), F.col("v").alias("z"))
    e3 = edges.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    return wedges.join(e3, ["y", "z"]).count()


def main() -> None:
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark("ab_triangles")
    spark.sparkContext.setLogLevel("ERROR")

    hub = spark.range(1, h + 1).select(
        F.lit(0).alias("u"), F.col("id").alias("v")
    )
    base = h + 1
    tri_ids = spark.range(r)
    rings = (
        tri_ids.select((base + 3 * F.col("id")).alias("a"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), (F.col("a") + 1).alias("v")),
                    F.struct(F.col("a").alias("u"), (F.col("a") + 2).alias("v")),
                    F.struct((F.col("a") + 1).alias("u"), (F.col("a") + 2).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
    )
    edges = hub.unionByName(rings).repartition(32)
    edges.persist().count()

    t0 = time.perf_counter()
    n_oriented = triangles(edges, "u", "v").count()
    t_oriented = time.perf_counter() - t0
    release_tracked()

    t0 = time.perf_counter()
    n_naive = naive_triangle_count(edges)
    t_naive = time.perf_counter() - t0

    assert n_oriented == n_naive == r, (n_oriented, n_naive, r)
    print(
        f"hub spokes={h} ring triangles={r}: "
        f"oriented {t_oriented:.2f}s vs naive {t_naive:.2f}s "
        f"({t_naive / t_oriented:.1f}x) — both exact ({r} triangles)"
    )


if __name__ == "__main__":
    main()
