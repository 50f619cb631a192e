"""Plan introspection utilities — the engine's self-check surface.

Used by the plan-regression tests (tests/test_plans.py) and handy
interactively: after building a query, assert the physical properties
that matter at 100 TB instead of eyeballing `.explain()` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "extended") -> str:
    """Full explain text (modes: simple, extended, formatted, cost,
    codegen) without capturing stdout."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def physical_tree(df: DataFrame) -> str:
    """Just the operator tree of the formatted plan."""
    return plan_string(df, "formatted").split("\n\n")[0]


def count_exchanges(df: DataFrame) -> int:
    return physical_tree(df).count("Exchange")


def scan_columns(df: DataFrame, table_substr: str = "") -> list[list[str]]:
    """Column lists actually read by each parquet scan (column pruning
    check) — optionally filtered to scans whose path matches."""
    out = []
    plan = plan_string(df)
    for m in re.finditer(
        r"FileScan parquet \[([^\]]*)\][^\n]*Location: [^\n]*?([\w./]*)\n?", plan
    ):
        cols, loc = m.group(1), m.group(0)
        if table_substr and table_substr not in loc:
            continue
        out.append([c.split("#")[0] for c in cols.split(",") if c])
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    plan = plan_string(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def has_cartesian(df: DataFrame) -> bool:
    p = plan_string(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider = fewer interpreter
    boundaries)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df, "formatted"))))
