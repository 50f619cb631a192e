"""Explicit StructTypes — the engine's schema system.

The reference transports change events as schema-less JSON (Kafka Connect
``schemas.enable=false``, mysql-connector-config-clean.json:28-29) and
relies on fixed DDL at both ends.  Spark-side we make the schema explicit
everywhere: ``from_json`` with these StructTypes is the schema-on-read
step that replaces Debezium's ExtractNewRecordState unwrap
(mysql-connector-config-clean.json:21-22).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The reference OLTP source row (bank_accounts, reconstructed — FIXTURES.md A1;
# evidence: simple_kafka_etl.py:77,115 / test-etl-pipeline.sh:168).
BANK_ACCOUNT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("user_id", LongType()),
        StructField("account", StringType()),
        StructField("registered_at", TimestampType()),
    ]
)

# Flattened Debezium after-state message, post-SMT (FIXTURES.md A2).
# ``__deleted`` is deliberately a STRING ('true'/'false'), not a boolean —
# preserving the reference's wire format (simple_kafka_etl.py:76,114).
CHANGE_EVENT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("user_id", LongType()),
        StructField("account", StringType()),
        StructField("registered_at", StringType()),
        StructField("__deleted", StringType()),
    ]
)

# Driver fixture `events` table (TESTDATA.md) — plays the Kafka change feed.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# JSON payload carried in events.props — parsed via from_json (S3/S5).
PROPS_SCHEMA = StructType([StructField("k", IntegerType())])


def evolve_schema(base: StructType, additions: list[StructField]) -> StructType:
    """Widen a wire schema with typed columns learned from the source's
    DDL history — the engine-side half of Debezium's schema-history
    topic (mysql-connector-config-clean.json:17,20).  When the upstream
    table is ALTERed, the capture layer records the DDL; the engine
    promotes the new columns into its ``from_json`` StructType, and
    events written BEFORE the ALTER parse with NULL for the new columns
    (null backfill) — no reprocessing, no second topic.

    Additions must be genuinely new: widening must never silently
    retype an existing column (that is a breaking change, not an
    evolution — it needs an explicit migration)."""
    existing = {f.name for f in base.fields}
    for f in additions:
        if f.name in existing:
            raise ValueError(
                f"evolve_schema: column {f.name!r} already exists — "
                f"retyping is a migration, not an evolution"
            )
    return StructType(list(base.fields) + list(additions))


def retire_columns(base: StructType, names: list[str]) -> StructType:
    """The REMOVAL direction of schema evolution (the other half of
    Debezium's schema-history semantics): the upstream table DROPs a
    column, so wire events after the DDL simply omit it.  The engine's
    read schema RETAINS the column — pre-drop history must still parse,
    and ``from_json`` null-fills it on post-drop events for free — so
    retirement is metadata, never a narrower StructType (narrowing would
    silently corrupt replays of the pre-DDL topic prefix).  Readers that
    need the retired column's last state carry it forward per key
    (last_value IGNORE NULLS — see cdc_schema_evolution_drop).

    Raises on unknown names: retiring a column that never existed is a
    config error, not an evolution."""
    existing = {f.name for f in base.fields}
    unknown = [n for n in names if n not in existing]
    if unknown:
        raise ValueError(
            f"retire_columns: unknown column(s) {unknown!r} — cannot "
            f"retire a column that was never part of the schema"
        )
    retired = set(names)
    return StructType(
        [
            StructField(
                f.name,
                f.dataType,
                f.nullable,
                {**(f.metadata or {}), "retired": True}
                if f.name in retired
                else f.metadata,
            )
            for f in base.fields
        ]
    )


def rename_columns(base: StructType, renames: dict[str, str]) -> StructType:
    """The RENAME direction of schema evolution (r8 — completes the
    ADD/DROP/RENAME triple): the upstream table renames a column
    mid-feed, so Debezium emits the NEW field name after the DDL and the
    topic's prefix still carries the OLD one.  A rename is modeled as
    retire(old) + add(new with the SAME type) + metadata linking the two
    (``renamed_to`` / ``renamed_from``), so ONE ``from_json`` StructType
    parses both vintages — pre-DDL rows fill the old field (new is
    null), post-DDL rows fill the new field (old is null) — and readers
    unify with ``coalesce(new, old)`` per ``renamed_pairs``, preserving
    per-key value continuity across the boundary (carry windows and
    snapshots never see a gap).

    Raises when the old name is unknown, the new name already exists, or
    old == new — each is a config error, not an evolution."""
    existing = {f.name for f in base.fields}
    targets = list(renames.values())
    dup = {n for n in targets if targets.count(n) > 1}
    if dup:
        raise ValueError(
            f"rename_columns: multiple renames target the same new "
            f"name(s) {sorted(dup)!r} — the result would carry duplicate "
            f"fields"
        )
    for old, new in renames.items():
        if old not in existing:
            raise ValueError(
                f"rename_columns: unknown column {old!r} — cannot rename "
                f"a column that was never part of the schema"
            )
        if old == new:
            raise ValueError(
                f"rename_columns: {old!r} -> {new!r} is a no-op rename"
            )
        if new in existing:
            raise ValueError(
                f"rename_columns: target name {new!r} collides with an "
                f"existing column — that is a migration, not an evolution"
            )
    by_old = dict(renames)
    fields = [
        StructField(
            f.name,
            f.dataType,
            f.nullable,
            {**(f.metadata or {}), "retired": True, "renamed_to": by_old[f.name]}
            if f.name in by_old
            else f.metadata,
        )
        for f in base.fields
    ]
    type_of = {f.name: (f.dataType, f.nullable) for f in base.fields}
    fields += [
        StructField(new, *type_of[old], {"renamed_from": old})
        for old, new in renames.items()
    ]
    return StructType(fields)


def widen_column(base: StructType, name: str, new_type) -> StructType:
    """The type-WIDENING direction of schema evolution (r9 — the fourth
    real Debezium direction after ADD/DROP/RENAME): the upstream column
    outgrows its type (INT overflows, DECIMAL needs more precision) and
    the table is ALTERed mid-feed.  The engine re-types its ONE
    ``from_json`` StructType to the wider type: pre-DDL rows parse
    losslessly into it (every int32 is an int64; every DECIMAL(p,s)
    value fits DECIMAL(P,S) when S ≥ s and P−S ≥ p−s), post-DDL rows
    carry values only the wide type can hold — no reprocessing, no
    second topic, and per-key carry windows span the DDL boundary
    untouched.

    Only LOSSLESS promotions are allowed; anything else (narrowing,
    scale loss, cross-family retypes like string→int) raises — that is
    a migration, not an evolution.  The field records ``widened_from``
    metadata so readers can tell a widened column from a born-wide
    one."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        FloatType,
        ShortType,
    )

    by_name = {f.name: f for f in base.fields}
    if name not in by_name:
        raise ValueError(
            f"widen_column: unknown column {name!r} — cannot widen a "
            f"column that was never part of the schema"
        )
    old_type = by_name[name].dataType
    _int_rank = {ByteType: 0, ShortType: 1, IntegerType: 2, LongType: 3}

    def _ok(old, new) -> bool:
        if old == new:
            return False  # no-op "widen" is a config error
        ro, rn = _int_rank.get(type(old)), _int_rank.get(type(new))
        if ro is not None and rn is not None:
            return rn > ro
        if isinstance(old, FloatType) and isinstance(new, DoubleType):
            return True
        if isinstance(old, DecimalType) and isinstance(new, DecimalType):
            return (
                new.scale >= old.scale
                and new.precision - new.scale >= old.precision - old.scale
                and (new.precision, new.scale)
                != (old.precision, old.scale)
            )
        return False

    if not _ok(old_type, new_type):
        raise ValueError(
            f"widen_column: {old_type.simpleString()} -> "
            f"{new_type.simpleString()} is not a lossless widening — "
            f"that is a migration, not an evolution"
        )
    return StructType(
        [
            StructField(
                f.name,
                new_type if f.name == name else f.dataType,
                f.nullable,
                {
                    **(f.metadata or {}),
                    "widened_from": old_type.simpleString(),
                }
                if f.name == name
                else f.metadata,
            )
            for f in base.fields
        ]
    )


def renamed_pairs(schema: StructType) -> list[tuple[str, str]]:
    """(new, old) pairs recorded by ``rename_columns`` — the reader-side
    unification map: project ``coalesce(new, old) AS new`` and drop
    ``old``."""
    return [
        (f.name, f.metadata["renamed_from"])
        for f in schema.fields
        if f.metadata and "renamed_from" in f.metadata
    ]
