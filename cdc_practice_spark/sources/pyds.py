"""Spark 4 Python DataSource: a native ``debezium_jsonl`` format.

The reference's wire format is flattened Debezium JSON on a Kafka topic
(mysql-connector-config-clean.json:21-29); its offline twin is JSONL
capture files (one SMT-flattened envelope per line, tombstones as
``null``).  This data source makes those files a first-class format:

    spark.dataSource.register(DebeziumJsonlDataSource)
    spark.read.format("debezium_jsonl").load("/captures/")

yielding the SAME columns ``parse_debezium`` produces from a Kafka scan
(kafka_topic, kafka_partition, kafka_offset, id, user_id, account,
registered_at, __deleted) — one file plays one topic-partition, the
line number is the offset, tombstone lines are filtered (P1).

Scale shape: ``partitions()`` returns one InputPartition per capture
file, so Spark schedules file-granular parallel reads exactly like the
built-in text source; each partition streams line-by-line (no whole-file
buffering).  This is the Python DataSource API tier — the right tool
for custom FORMATS, where the per-row work is parsing anyway (a JVM
format would only move the json.loads).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

try:  # Spark 4+ only; the module stays importable elsewhere
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    _HAVE_PYDS = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceWriter = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    SimpleDataSourceStreamReader = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]
    _HAVE_PYDS = False

WIRE_SCHEMA_DDL = (
    "kafka_topic string, kafka_partition int, kafka_offset long, "
    "id long, user_id long, account string, registered_at string, "
    "__deleted string"
)

DEFAULT_TOPIC = "dbserver1.bankdb.bank_accounts"


class _FilePartition(InputPartition):
    def __init__(self, path: str, partition_id: int):
        self.path = path
        self.partition_id = partition_id


def _capture_files(path: str) -> list[str]:
    """Files that constitute a capture directory, manifest-aware.

    A ``_SUCCESS`` manifest written by DebeziumJsonlWriter lists exactly
    the part files its job committed — reading it (instead of globbing)
    means files from failed/speculative/retried task attempts and from
    superseded writes are never replayed as duplicate rows.  Directories
    without a manifest (hand-authored fixtures, plain capture drops)
    fall back to the sorted ``*.jsonl`` glob."""
    if not os.path.isdir(path):
        return [path]
    succ = os.path.join(path, "_SUCCESS")
    if os.path.isfile(succ):
        try:
            with open(succ, encoding="utf-8") as fh:
                content = fh.read().strip()
            if content:
                files = json.loads(content)["files"]
                return sorted(os.path.join(path, f) for f in files)
        except (ValueError, KeyError, OSError):
            pass  # unreadable/legacy manifest — glob fallback below
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".jsonl")
    )


class DebeziumJsonlReader(DataSourceReader):
    """Batch reader with FILTER PUSHDOWN (Spark 4 ``pushFilters``):

    - ``kafka_partition`` equality/In → FILE pruning: a capture file IS
      a partition, so the predicate selects files before any IO (the
      Python-DataSource analogue of parquet partition pruning);
    - ``kafka_offset`` ranges → LINE-RANGE pruning: the offset is the
      line number, so a lower bound skips lines cheaply and an upper
      bound STOPS the scan (replay-window reads don't touch the tail).

    Accepted filters are fully enforced here (the pushFilters contract:
    Spark removes them from the post-scan Filter); everything else is
    returned unsupported and evaluated by Spark as usual.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("debezium_jsonl requires a path")
        self.topic = options.get("topic", DEFAULT_TOPIC)
        self._parts_keep: set[int] | None = None  # None = all files
        self._off_lo = 0
        self._off_hi: int | None = None

    def pushFilters(self, filters):  # type: ignore[override]
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = ".".join(getattr(f, "attribute", ()) or ())
            if attr == "kafka_partition" and isinstance(f, EqualTo):
                keep = {int(f.value)}
                self._parts_keep = (
                    keep if self._parts_keep is None else self._parts_keep & keep
                )
            elif attr == "kafka_partition" and isinstance(f, In):
                keep = {int(v) for v in f.value}
                self._parts_keep = (
                    keep if self._parts_keep is None else self._parts_keep & keep
                )
            elif attr == "kafka_offset" and isinstance(f, EqualTo):
                v = int(f.value)
                self._off_lo = max(self._off_lo, v)
                self._off_hi = v if self._off_hi is None else min(self._off_hi, v)
            elif attr == "kafka_offset" and isinstance(f, GreaterThan):
                self._off_lo = max(self._off_lo, int(f.value) + 1)
            elif attr == "kafka_offset" and isinstance(f, GreaterThanOrEqual):
                self._off_lo = max(self._off_lo, int(f.value))
            elif attr == "kafka_offset" and isinstance(f, LessThan):
                v = int(f.value) - 1
                self._off_hi = v if self._off_hi is None else min(self._off_hi, v)
            elif attr == "kafka_offset" and isinstance(f, LessThanOrEqual):
                v = int(f.value)
                self._off_hi = v if self._off_hi is None else min(self._off_hi, v)
            else:
                yield f  # unsupported — Spark evaluates it post-scan

    def partitions(self) -> Sequence[_FilePartition]:
        files = _capture_files(self.path)
        return [
            _FilePartition(p, i)
            for i, p in enumerate(files)
            if self._parts_keep is None or i in self._parts_keep
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for offset, line in enumerate(fh):
                if offset < self._off_lo:
                    continue
                if self._off_hi is not None and offset > self._off_hi:
                    break  # upper bound: stop the scan, don't read the tail
                line = line.strip()
                if not line or line == "null":  # tombstone (P1)
                    continue
                d = json.loads(line)
                if d is None:
                    continue
                yield (
                    self.topic,
                    partition.partition_id,
                    offset,
                    d.get("id"),
                    d.get("user_id"),
                    d.get("account"),
                    d.get("registered_at"),
                    d.get("__deleted", "false"),
                )


class DebeziumJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail over a directory of capture files: the offset is
    {file: lines_consumed}; each micro-batch emits lines appended (or
    files added) since the last committed offset — the pure-Python twin
    of tailing the Kafka topic itself.  readBetweenOffsets replays a
    committed range deterministically (files are append-only), which is
    what gives the source exactly-once recovery."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("debezium_jsonl requires a path")
        self.topic = options.get("topic", DEFAULT_TOPIC)

    def _files(self) -> list[str]:
        return _capture_files(self.path)

    def initialOffset(self) -> dict:
        return {"lines": {}}

    def _emit(self, path: str, part_id: int, lo: int, hi: int):
        with open(path, encoding="utf-8") as fh:
            for offset, line in enumerate(fh):
                if offset < lo or offset >= hi:
                    continue
                line = line.strip()
                if not line or line == "null":
                    continue
                d = json.loads(line)
                if d is None:
                    continue
                yield (
                    self.topic,
                    part_id,
                    offset,
                    d.get("id"),
                    d.get("user_id"),
                    d.get("account"),
                    d.get("registered_at"),
                    d.get("__deleted", "false"),
                )

    def _count_lines(self, path: str) -> int:
        with open(path, encoding="utf-8") as fh:
            return sum(1 for _ in fh)

    def read(self, start: dict):
        consumed = dict(start.get("lines", {}))
        rows: list[tuple] = []
        end = {"lines": dict(consumed)}
        for part_id, path in enumerate(self._files()):
            lo = int(consumed.get(path, 0))
            hi = self._count_lines(path)
            if hi > lo:
                rows.extend(self._emit(path, part_id, lo, hi))
            end["lines"][path] = max(hi, lo)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        s = start.get("lines", {})
        e = end.get("lines", {})
        rows: list[tuple] = []
        for part_id, path in enumerate(self._files()):
            lo, hi = int(s.get(path, 0)), int(e.get(path, 0))
            if hi > lo:
                rows.extend(self._emit(path, part_id, lo, hi))
        return iter(rows)


class DebeziumJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "debezium_jsonl"

    def schema(self) -> str:
        return WIRE_SCHEMA_DDL

    def reader(self, schema) -> DebeziumJsonlReader:
        return DebeziumJsonlReader(self.options)

    def simpleStreamReader(self, schema) -> DebeziumJsonlStreamReader:
        return DebeziumJsonlStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "DebeziumJsonlWriter":
        return DebeziumJsonlWriter(self.options, overwrite)


class _PartCommit(WriterCommitMessage):
    """Task → driver commit message: which part file this attempt wrote."""

    def __init__(self, file: str, rows: int):
        self.file = file
        self.rows = rows


class DebeziumJsonlWriter(DataSourceWriter):
    """Export path: each task writes its partition as one
    ``part-<uuid>.jsonl`` capture file (wire-format lines: the payload
    fields only — Kafka coordinates are transport, not payload) and
    reports the filename in its commit message; ``commit`` publishes
    exactly the reported files as a ``_SUCCESS`` JSON manifest that the
    readers honor (``_capture_files``).  Files from failed, speculative
    or retried attempts are never referenced, so they can't read back as
    duplicate rows; ``abort`` deletes whatever the finished tasks wrote.

    ``overwrite`` (mode("overwrite")) removes every pre-existing part
    file not referenced by THIS job's manifest at commit time; append
    mode merges the new parts into the previous manifest instead (or
    adopts the legacy glob set when no manifest exists)."""

    PAYLOAD = ("id", "user_id", "account", "registered_at", "__deleted")

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("debezium_jsonl requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> "_PartCommit":
        import uuid as _uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as fh:
            for row in iterator:
                d = row.asDict()
                payload = {k: d[k] for k in self.PAYLOAD if k in d}
                fh.write(json.dumps(payload, default=str) + "\n")
                n += 1
        return _PartCommit(name, n)

    def commit(self, messages) -> None:
        new_parts = sorted(m.file for m in messages if m is not None)
        if self.overwrite:
            files = new_parts
            keep = set(new_parts)
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and f not in keep:
                    try:
                        os.remove(os.path.join(self.path, f))
                    except OSError:
                        pass
        else:
            prior = [
                os.path.basename(p)
                for p in _capture_files(self.path)
                if os.path.basename(p) not in set(new_parts)
            ]
            files = sorted(prior + new_parts)
        manifest = {"files": files}
        tmp = os.path.join(self.path, "._SUCCESS.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_SUCCESS"))

    def abort(self, messages) -> None:
        # Delete the parts that completed tasks DID write — uncommitted
        # data must not survive to be globbed by a manifest-less reader.
        for m in messages or ():
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.file))
            except OSError:
                pass


def register(spark) -> bool:
    """Register the format on a session; returns False when the Python
    DataSource API is unavailable (pre-4.0)."""
    if not _HAVE_PYDS:
        return False
    # the reader implements pushFilters(); Spark refuses to plan it
    # unless Python-source pushdown is explicitly enabled
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DebeziumJsonlDataSource)
    return True
