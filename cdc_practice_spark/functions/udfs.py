"""User-defined function surface: vectorized UDF, grouped-agg UDAF,
and table function (UDTF).

Placement guidance (the engine's UDF policy, enforced by example):
  - built-in expressions first (whole-stage codegen);
  - Arrow-vectorized pandas_udf / mapInPandas when Python is required —
    one Python call per batch;
  - row-at-a-time @udf / @udtf ONLY off the hot path (they serialize per
    row); the UDTF here is a corpus-prep utility, not a per-event op.

UDFs are built lazily (factory functions): decorating at import time
requires an active SparkSession, which test collection doesn't have.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf


@lru_cache(maxsize=None)
def geomean_udaf():
    """Grouped-agg pandas UDAF: geometric mean.  Receives the whole
    group's column as one Arrow-backed Series — a single numpy pass per
    group, not per row.  exp(mean(log x)) matches the SQL oracle's
    exp(avg(ln x)) formula."""

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return geomean


@lru_cache(maxsize=None)
def clipped_ratio():
    """Scalar vectorized UDF: elementwise safe ratio clipped to [0, 1] —
    one Arrow batch per call."""

    @pandas_udf("double")
    def ratio(num: pd.Series, den: pd.Series) -> pd.Series:
        import numpy as np

        r = num.to_numpy(dtype="float64") / np.maximum(
            den.to_numpy(dtype="float64"), 1e-9
        )
        return pd.Series(np.clip(r, 0.0, 1.0))

    return ratio


class _ChunkText:
    """UDTF: split a document into fixed-size token chunks (the standard
    LLM-ingest windowing step).  One input row → many output rows.

    Row-at-a-time by design (corpus prep, not per-event path); the
    distributed shape still holds — each partition runs its own UDTF
    instances, no driver involvement."""

    def eval(self, text: str, chunk_tokens: int = 32):
        if text is None:
            return
        toks = text.split()
        for ci, start in enumerate(range(0, len(toks), chunk_tokens)):
            window = toks[start : start + chunk_tokens]
            yield ci, " ".join(window), len(window)


@lru_cache(maxsize=None)
def chunk_text_udtf():
    return udtf(_ChunkText, returnType="chunk_idx int, chunk string, n_tokens int")
