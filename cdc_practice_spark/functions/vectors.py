"""Vector math column functions (embedding similarity).

Built-in higher-order functions (``zip_with``/``aggregate``) keep the dot
product JVM-side with a DETERMINISTIC left-to-right summation order —
required for bit-stable results vs the oracle (a parallel/tree reduction
would reassociate floating-point adds).  Cast to double first: float32
accumulation would both lose precision and diverge between engines.

For wide batch scoring there is also a Pandas-UDF path (Arrow-vectorized
numpy matmul) in operators/similarity.py — ~10-100× the throughput of
row-at-a-time Python, used when the query scores against a broadcast
matrix of query vectors rather than one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def lit_double_array(xs) -> Column:
    """A Python sequence of floats as ONE array<double> literal, built
    by parsing a single SQL string (r12 optimization): every ``F.lit``
    is a py4j round trip, so literal query vectors / LUT rows /
    centroid tables built scalar-by-scalar cost ~10 ms PER ELEMENT of
    pure driver time (a 64-dim query vector ≈ 0.7 s, the 1k-scalar PQ
    codebook ≈ 12 s — rebuilt per k-means iteration).  ``repr``-
    formatted ``D``-suffixed literals round-trip bit-exactly through
    the SQL parser (verified incl. subnormals, ±0.0, max double), so
    the Literal tree is identical to the per-scalar build.  Non-finite
    values need the cast form (r12 ADVICE): ``repr`` emits ``nan``/
    ``inf``, which suffixed with D parse as identifiers, not literals —
    the old per-scalar ``F.lit`` built valid NaN/Infinity literals and
    callers (brute_force_topk, _exact_rerank) accept arbitrary user
    query vectors."""
    import math

    def one(x) -> str:
        x = float(x)
        if math.isnan(x):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(x):
            return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
        return f"{x!r}D"

    xs = list(xs)
    if not xs:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ",".join(one(x) for x in xs) + ")")


def lit_long_array(xs) -> Column:
    """Same single-parse construction for array<bigint> literals."""
    xs = list(xs)
    if not xs:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in xs) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (norm(a) * norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """``dot`` with the fold UNROLLED over a known dimensionality: the
    higher-order ``aggregate`` evaluates its lambda per element through
    the expression interpreter (~100 ns/element — measured 234 s for a
    400M-pair exact kNN build), while an unrolled a[0]*b[0]+…+a[d-1]*
    b[d-1] chain compiles into whole-stage codegen as straight-line
    arithmetic.  The ADDITION ORDER is the same left fold, so results
    are bit-identical to ``dot`` — callers may switch tiers on size
    without an oracle divergence."""
    s = a[0] * b[0]
    for i in range(1, dim):
        s = s + a[i] * b[i]
    return s
