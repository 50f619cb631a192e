"""Exact fixed-point money arithmetic on int64 — the fast path for
decimal-exact aggregation.

Why: Spark's ``sum(decimal(p,2))`` returns ``decimal(p+10,2)``; for any
p > 8 that exceeds the 18-digit long-backed Decimal fast path, so every
partial sum runs on heap BigDecimals (A/B at sf0.1: 1.11 s vs 0.54 s
for the TPC-H Q1 aggregate).  Fixed-point keeps the hot per-row multiply
and the shuffle-side SUM on primitive longs inside whole-stage codegen,
then converts to the rounded-double output AFTER aggregation, where only
one row per group remains and decimal math costs nothing.

Exactness: money values are 2-decimal; ``round(x*100)`` recovers the
exact cent count from the double (always within 1e-9 of integral), so
integer sums are penny-exact — identical to the DuckDB oracle's
DECIMAL sums, and the final decimal division + HALF_UP round + double
cast is bit-identical to ``CAST(round(sum(...), 2) AS DOUBLE)``.

Overflow (the 100 TB caveat): int64 caps a per-group sum at ~9.2e18
units.  At scale 1e-6 (two-factor products like Q1's charge) and
worst-case ~1e11 units/row that's ~8e7 rows per group; beyond that,
pre-aggregate per (group, salt) on the long path and combine the few
thousand partials as decimals — same answer, two cheap shuffles.  Spark
4's ANSI mode makes any miss a loud error, never a silent wrap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed(col: Column | str, scale: int = 2) -> Column:
    """Exact int64 fixed-point units from a 2-decimal-valued double
    column (e.g. dollars → cents for scale=2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale), 0).cast("bigint")


def sum_fixed_as_double(
    units: Column, in_scale: int, out_round: int = 2
) -> Column:
    """SUM int64 fixed-point units; emit the post-aggregation value as
    ``round(sum / 10^in_scale, out_round)`` cast to double — the exact
    twin of ``CAST(round(sum(DECIMAL ...), out_round) AS DOUBLE)``.

    The division runs on decimals (exact, HALF_UP) but only on the one
    row per group that survives aggregation."""
    s = F.sum(units).cast("decimal(38,0)")
    q = s / F.lit(10**in_scale).cast("decimal(19,0)")
    return F.round(q, out_round).cast("double")


def sum_fixed_exact_double(units: Column, in_scale: int) -> Column:
    """SUM int64 units → the UNROUNDED value as double, via exact decimal
    division (bit-identical to ``CAST(sum(DECIMAL ...) AS DOUBLE)`` —
    casting the long sum straight to double would lose exactness past
    2^53 units)."""
    s = F.sum(units).cast("decimal(38,0)")
    return (s / F.lit(10**in_scale).cast("decimal(19,0)")).cast("double")


def sum_fixed_as_avg(units: Column, in_scale: int, n: Column, out_round: int = 6) -> Column:
    """round(CAST(sum AS DOUBLE) / n, out_round) over fixed-point units:
    the exact-sum-then-double-average shape the oracles use."""
    s = F.sum(units).cast("double") / F.lit(float(10**in_scale))
    return F.round(s / n, out_round)
