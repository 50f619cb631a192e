"""Property-based checks for the newest fast paths.

1. connected_components (with the hop-folded initialization and no edge
   distinct) vs a pure-Python union-find on random edge lists — the
   closure must agree for arbitrary graph shapes (chains, cliques,
   singleton pairs, self-loops excluded by construction).
2. with_minhash_arrow vs the JVM shingle/signature pipeline on random
   text including whitespace edge cases — byte-exact signature parity.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_practice_spark.operators import dedup as D
from cdc_practice_spark.operators.cluster import connected_components

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1]).map(lambda e: (min(e), max(e))),
    min_size=1,
    max_size=40,
    unique=True,
)


def union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.slow
@given(edge_lists)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.component
        for r in connected_components(
            pairs, max_iter=30, local_threshold=0, two_phase=False
        ).collect()  # force the propagation LOOP (local tier IS union-find)
    }
    assert got == union_find_components(edges)


@pytest.mark.slow
@given(edge_lists)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_phase_components_match_union_find(spark, edges):
    """The two-phase contraction tier (partition-local union-find +
    quotient gluing) must agree with plain union-find on ANY graph AND
    any partitioning — including an adversarial random repartition that
    destroys edge locality (the worst case for contraction: the quotient
    barely shrinks, but exactness must hold)."""
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = union_find_components(edges)
    for frame in (pairs, pairs.repartition(7)):
        got = {
            r.node: r.component
            for r in connected_components(
                frame, max_iter=30, local_threshold=0, two_phase=True
            ).collect()
        }
        assert got == want


texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c\t\n xyz.!")),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@given(texts)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_arrow_parity_random_text(spark, txts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(txts)], "doc_id long, text string"
    )
    jvm_hs = D.with_shingle_hashes(docs).select("doc_id", "hs")
    jvm = {
        r.doc_id: tuple(r[f"mh{j}"] for j in range(D.NUM_PERM))
        for r in jvm_hs.select(
            "doc_id", *D.minhash_signature(F.col("hs"))
        ).collect()
    }
    arw = {
        r.doc_id: tuple(r[f"mh{j}"] for j in range(D.NUM_PERM))
        for r in D.with_minhash_arrow(docs).collect()
    }
    assert arw == jvm


@pytest.mark.slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
    ).map(lambda es: sorted({(a, b) for a, b in es if a != b}))
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pagerank_matches_integer_model(spark, edges):
    """pagerank_fixed vs a pure-Python replay of the exact integer
    algebra — bit-equality required on arbitrary digraphs (the whole
    point of the fixed-point design)."""
    from cdc_practice_spark.operators.pagerank import (
        BASE_UNITS,
        INIT_UNITS,
        pagerank_fixed,
    )
    from cdc_practice_spark.plans.cache import release_tracked

    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_units for r in pagerank_fixed(df, n_iter=3).collect()}
    release_tracked()

    nodes = sorted({n for e in edges for n in e})
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: INIT_UNITS for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += (r[s] * 85) // (100 * outdeg[s])
        r = {n: BASE_UNITS + contrib[n] for n in nodes}
    assert got == r
