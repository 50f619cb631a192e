"""A/B: two-phase contraction vs adaptive pointer-jumping vs plain
one-hop min-label propagation
on the adversarial CC stress graph (queries/graph_queries.py — ~227k
edges, >200k so the DISTRIBUTED tier runs; 100 chains of 256 with skip
edges ⇒ diameter ~127, plus power-law stars up to 30k spokes).

Plain propagation advances one hop per round — O(diameter) rounds —
while pointer jumping squares the propagated distance — O(log diameter).
This script times both and prints rounds + wall seconds; numbers are
recorded in SCALE.md §CC.

Usage: python tools/ab_cc.py [plain_max_iter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_practice_spark.operators.cluster import connected_components
from cdc_practice_spark.plans.cache import release_tracked
from cdc_practice_spark.queries.graph_queries import adversarial_edges
from cdc_practice_spark.session import get_spark


def run(
    edges, pointer_jumping: bool, max_iter: int, two_phase: bool = False
) -> tuple[float, int, bool]:
    t0 = time.perf_counter()
    converged = True
    try:
        comp = connected_components(
            edges,
            max_iter=max_iter,
            pointer_jumping=pointer_jumping,
            local_threshold=0 if not two_phase else 200_000,
            two_phase=two_phase,  # False forces the propagation LOOP
        )
        n = comp.select("component").distinct().count()
    except RuntimeError:  # strict non-convergence
        converged, n = False, -1
    dt = time.perf_counter() - t0
    release_tracked()
    return dt, n, converged


def main() -> None:
    plain_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    spark = get_spark("ab-cc")
    spark.sparkContext.setLogLevel("ERROR")
    edges = adversarial_edges(spark)
    print(f"edges: {edges.count()}")

    dt, n, _ = run(edges, pointer_jumping=True, max_iter=48, two_phase=True)
    print(f"two-phase contraction : {dt:7.2f}s  components={n}")

    dt, n, _ = run(edges, pointer_jumping=True, max_iter=48)
    print(f"pointer-jumping loop  : {dt:7.2f}s  components={n}")

    dt, n, ok = run(edges, pointer_jumping=False, max_iter=plain_cap)
    status = f"components={n}" if ok else f"DID NOT CONVERGE in {plain_cap} rounds"
    print(f"plain propagation({plain_cap} cap): {dt:7.2f}s  {status}")


if __name__ == "__main__":
    main()
