"""Sequence packing — the training-data step that concatenates documents
into fixed-token-budget bins (one bin ≈ one training sequence), so short
documents don't waste context-window padding.

Semantics (deterministic, oracle-checkable): within each group (e.g.
source shard), documents are visited in ascending ``doc_id`` order with
a greedy first-fit-in-order rule — a running bin fills until adding the
next document would exceed ``capacity`` tokens, then a new bin starts.
A document larger than the capacity gets a bin of its own (the real
pipeline would chunk it first — operators covered by udtf_text_chunks).

Spark-first shape: greedy packing is a running-state scan (each row's
bin depends on every prior row in the group), which no closed-form
window expression computes — ``floor(cumsum/capacity)`` splits documents
across bins, changing semantics.  So this is the applyInPandas tier
(SURVEY.md custom-operator rule (b)): one shuffle on the group key, one
numpy pass per group.  At 100 TB groups are (source, shard-hash) so no
group outgrows an executor; packing quality is unchanged because bins
never span shards anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    docs: DataFrame,
    capacity: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    init: dict | None = None,
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id, bin_fill) per document, where
    ``bin_id`` numbers bins within the group from 0 and ``bin_fill`` is
    the bin's running token total after this document.

    ``init`` maps group -> (bin_id, bin_fill) to CONTINUE packing from a
    previous batch's end state (the streaming ingest sink carries this
    per-source state across micro-batches, so id-ordered chunked packing
    is bit-identical to packing the whole stream at once)."""
    import pandas as pd

    init = init or {}

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = init.get(pdf[group_col].iloc[0], (0, 0))
        for tok in pdf[tokens_col]:
            tok = int(tok)
            if fill > 0 and fill + tok > capacity:
                bin_id += 1
                fill = 0
            fill += tok
            bins.append(bin_id)
            fills.append(fill)
        out = pdf[[group_col, id_col, tokens_col]].copy()
        out["bin_id"] = pd.Series(bins, dtype="int64")
        out["bin_fill"] = pd.Series(fills, dtype="int64")
        return out

    schema = (
        f"{group_col} string, {id_col} long, {tokens_col} long, "
        "bin_id long, bin_fill long"
    )
    return (
        docs.select(
            F.col(group_col),
            F.col(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
        )
        .groupBy(group_col)
        .applyInPandas(per_group, schema)
    )
