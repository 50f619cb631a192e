"""Synthesize an sf1-equivalent dataset by replicating sf0.1 ×10 with
key remapping — the direct measurement VERDICT r5 asked for (#4): the 2×
story for the ~15 floor-bound headliners rests on "the constant
scheduling floor amortizes at real scale"; this makes the scale exist so
the claim can be measured instead of argued.

Remapping keeps every intra-replica relationship intact (joins, CDC key
histories, document/embedding identity) while making replicas disjoint
in key space: per replica i, each table's primary key shifts by
i × (max_key + 1), and every foreign key shifts by ITS referenced
table's stride.  The tiny fixed dimensions (nation, region) are copied
once — all replicas share them, exactly how a real 10× fact growth
behaves.  Values, timestamps, text, and vectors are untouched, so
replica 0 of every table is byte-identical to sf0.1: per-row work is
identical and only the data VOLUME changes.

Two workload-shape caveats, both harmless for the ratio reading (both
engines see the same files): event-time density grows 10× inside the
same time range (window counts stay constant, rows per window grow), and
text/embedding near-dup queries see every document 10× (cross-replica
exact duplicates → bigger dup cliques than a real 10× corpus would
have — a HARSHER pair workload, not an easier one).

Usage: python tools/make_sf1.py [src_dir] [out_dir] [factor]
       (defaults: /root/testdata/sf0.1  /root/repo/.sf1  10)
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]

    strides = {
        "customer": stride("customer", "c_custkey"),
        "orders": stride("orders", "o_orderkey"),
        "part": stride("part", "p_partkey"),
        "supplier": stride("supplier", "s_suppkey"),
        "events": stride("events", "event_id"),
        "events_user": stride("events", "user_id"),
        "documents": stride("documents", "doc_id"),
        "embeddings": stride("embeddings", "vec_id"),
    }
    # (table, {column: stride-key}) — every key column shifts by the
    # stride of the table it references
    remaps = {
        "customer": {"c_custkey": "customer"},
        "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
        "lineitem": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
        "part": {"p_partkey": "part"},
        "supplier": {"s_suppkey": "supplier"},
        "events": {"event_id": "events", "user_id": "events_user"},
        "documents": {"doc_id": "documents"},
        "embeddings": {"vec_id": "embeddings"},
    }
    for table in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied (shared dimension)")
    for table, keys in remaps.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.i * {strides[keys[c]]} AS {c}" if c in keys else c
            for c in cols
        )
        # multi-row-group output (row_group_size) so Spark gets real scan
        # parallelism — a single-row-group file is one task per table
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{table}.parquet', "
            f"range({factor}) r(i)) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: ×{factor} → {n} rows")


if __name__ == "__main__":
    main()
