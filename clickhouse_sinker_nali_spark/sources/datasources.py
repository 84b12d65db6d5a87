"""Python DataSource connectors (Spark 4 ``pyspark.sql.datasource`` API).

The §2.10 extension surface as a REAL pluggable connector, not just parser
hooks: ``spark.read.format("qqwry")`` scans the reference's qqwry.dat geo
database (ipHandle/pkg/qqwry/qqwry.go:63-149 lookups; here the file IS a
table) through Spark's data source protocol — schema declaration,
partition planning, per-partition record iteration — so the binary format
composes with every DataFrame operator, predicate and all, instead of
needing the offline converter first.

Partitioning: the qqwry index is a flat array of 7-byte entries, so the
planner splits the INDEX RANGE into ``_N_SPLITS`` even slices — each task
re-opens the file, seeks its slice, and walks only its records.  Record
payloads are shared across slices (mode-1/2 redirections can point
anywhere), so every task maps the whole file but READS only its index
stripe plus the payloads it references — the standard cheap-split shape
for index-prefixed binary formats.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from .qqwry import _u32, iter_qqwry

_N_SPLITS = 4

_SCHEMA = (
    "ip_start bigint, ip_end bigint, loc string, isp string"
)


class _IndexSlice(InputPartition):
    def __init__(self, path: str, lo: int, hi: int) -> None:
        self.path = path
        self.lo = lo      # first index offset (inclusive)
        self.hi = hi      # last index offset (exclusive)


class QQWryReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("qqwry reader requires a path")
        self.path = path

    def partitions(self):
        with open(self.path, "rb") as f:
            head = f.read(8)
        first, last = _u32(head, 0), _u32(head, 4)
        n = (last - first) // 7 + 1
        per = max(1, -(-n // _N_SPLITS))
        parts = []
        for i in range(0, n, per):
            lo = first + i * 7
            hi = min(first + (i + per) * 7, last + 7)
            parts.append(_IndexSlice(self.path, lo, hi))
        return parts

    def read(self, partition: _IndexSlice):
        with open(partition.path, "rb") as f:
            data = f.read()
        # iter_qqwry walks [first, last]; emulate a slice by fabricating a
        # header bounded to this partition's index stripe
        import struct

        bounded = struct.pack("<II", partition.lo, partition.hi - 7) + data[8:]
        # offsets in the index/payload are absolute, so splice the original
        # byte buffer back in after the fabricated header
        view = bytearray(data)
        view[0:8] = bounded[0:8]
        for ip_start, ip_end, loc, isp in iter_qqwry(bytes(view)):
            yield (ip_start, ip_end + 1, loc, isp)


class QQWryDataSource(DataSource):
    """``spark.read.format("qqwry").load("/path/qqwry.dat")``."""

    @classmethod
    def name(cls) -> str:
        return "qqwry"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return QQWryReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(QQWryDataSource)


# --------------------------------------------------------------------------
# Shard-manifest writer: df.write.format("shardsink")
# --------------------------------------------------------------------------

import json as _json
import os as _os

from pyspark.sql.datasource import (
    DataSourceStreamReader,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, shard_file: str, n_rows: int, n_bytes: int) -> None:
        self.shard_file = shard_file
        self.n_rows = n_rows
        self.n_bytes = n_bytes


class ShardSinkWriter(DataSourceWriter):
    """Per-task JSONL shard files + a driver-committed manifest.

    The export_shards operator computes shard MEMBERSHIP as a query; this
    is the sink half as a pluggable format: each task streams its
    partition to ``part-<pid>.jsonl`` and returns (file, rows, bytes) as
    its commit message; ``commit`` runs once on the driver with every
    task's message and atomically writes ``manifest.json`` — the
    two-phase write protocol (no manifest ⇒ the export never happened,
    Spark's own _SUCCESS discipline made explicit).
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("shardsink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        fname = _os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = b = 0
        with open(fname, "w") as f:
            for row in iterator:
                line = _json.dumps(row.asDict(), default=str) + "\n"
                f.write(line)
                n += 1
                b += len(line)
        return _ShardCommit(_os.path.basename(fname), n, b)

    def commit(self, messages):
        manifest = {
            "shards": sorted(
                (
                    {
                        "file": m.shard_file,
                        "n_rows": m.n_rows,
                        "n_bytes": m.n_bytes,
                    }
                    for m in messages
                    if m is not None
                ),
                key=lambda d: d["file"],
            ),
            "total_rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = _os.path.join(self.path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f, indent=1, sort_keys=True)
        _os.replace(tmp, _os.path.join(self.path, "manifest.json"))

    def abort(self, messages):
        pass  # partial part files carry no manifest ⇒ export not visible


class ShardSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "shardsink"

    def schema(self):
        return "unused string"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return ShardSinkWriter(self.options, overwrite)


# --------------------------------------------------------------------------
# Replay stream source: spark.readStream.format("replay")
# --------------------------------------------------------------------------


class ReplayStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch replay of numbered JSONL files — the
    Kafka stand-in promoted to a REAL pluggable streaming source: offsets
    are file indexes, ``initialOffset``→0, each ``read`` consumes every
    file that has appeared since the last offset, and restart resumes
    from the checkpointed offset via ``readBetweenOffsets`` (the
    replayability contract Kafka gives via (partition, offset)).
    """

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("replay source requires a path")

    def initialOffset(self):
        return {"idx": 0}

    def _files(self):
        return sorted(
            f for f in _os.listdir(self.path) if f.endswith(".jsonl")
        )

    def read(self, start: dict):
        files = self._files()
        lo = start["idx"]
        rows = []
        for fname in files[lo:]:
            with open(_os.path.join(self.path, fname)) as f:
                for line in f:
                    d = _json.loads(line)
                    rows.append((d["doc_id"], d["text"]))
        return iter(rows), {"idx": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        rows = []
        for fname in files[start["idx"]:end["idx"]]:
            with open(_os.path.join(self.path, fname)) as f:
                for line in f:
                    d = _json.loads(line)
                    rows.append((d["doc_id"], d["text"]))
        return iter(rows)

    def commit(self, end) -> None:
        pass  # files are immutable; nothing to acknowledge


class ReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self):
        return "doc_id bigint, text string"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return ReplayStreamReader(self.options)


# --------------------------------------------------------------------------
# Kafka-shaped stream source: spark.readStream.format("kafkasim")
# --------------------------------------------------------------------------


KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def _kafka_partitions(topic_dir: str) -> list[int]:
    return sorted(
        int(f[len("partition-"):-len(".jsonl")])
        for f in _os.listdir(topic_dir)
        if f.startswith("partition-") and f.endswith(".jsonl")
    )


def _kafka_end_offsets(topic_dir: str) -> dict[str, int]:
    out = {}
    for p in _kafka_partitions(topic_dir):
        with open(_os.path.join(topic_dir, f"partition-{p}.jsonl")) as f:
            out[str(p)] = sum(1 for _ in f)
    return out


def _kafka_read_slice(topic_dir: str, topic: str, part: int, lo: int, hi: int):
    """Decode rows [lo, hi) of one partition log — shared by the
    driver-side simple reader and the executor-side parallel reader."""
    from datetime import datetime, timedelta

    rows = []
    with open(_os.path.join(topic_dir, f"partition-{part}.jsonl")) as f:
        for off, line in enumerate(f):
            if off < lo:
                continue
            if off >= hi:
                break
            d = _json.loads(line)
            key = d.get("key")
            ts = d.get("ts")
            # ts default must be DETERMINISTIC in (partition, offset):
            # Spark replays a committed offset range through
            # readBetweenOffsets after failure recovery, and a
            # wall-clock stamp would make the replayed batch differ
            # from the original (breaking exactly-once for the
            # timestamp column and anything windowed on it)
            ts_val = (
                datetime.fromisoformat(ts).replace(tzinfo=None)
                if ts
                else datetime(2024, 1, 1) + timedelta(seconds=off, milliseconds=part)
            )
            rows.append(
                (
                    key.encode() if key is not None else None,
                    d["value"].encode(),
                    topic,
                    part,
                    off,
                    ts_val,
                    0,  # CreateTime, as the Kafka source reports
                )
            )
    return rows


class KafkaSimStreamReader(SimpleDataSourceStreamReader):
    """A broker-free source with Kafka's EXACT contract, so the full
    ``build_kafka_source`` option surface is exercisable end-to-end in
    this container (no broker exists here; reference input/kafka_sarama.go
    consumes the real thing):

    - schema = the 7 columns Spark's Kafka source emits (key/value as
      BINARY, timestampType 0 = CreateTime);
    - a "topic" is a directory of ``partition-N.jsonl`` files, offset =
      line number within the partition file (dense, per-partition
      monotonic — Kafka's replayability contract);
    - ``subscribe`` picks the topic subdirectory;
    - ``startingOffsets``: ``earliest`` | ``latest`` | per-partition JSON
      (``{"<topic>": {"0": 5, ...}}``), resolved once at query start,
      exactly like the Kafka source;
    - ``maxOffsetsPerTrigger``: total per-batch cap apportioned across
      partitions proportionally to their lag (floor + leftover to the
      lowest partitions), Spark's Kafka rate-limit shape;
    - restart resumes from the checkpointed per-partition offsets via
      ``readBetweenOffsets``.
    """

    def __init__(self, options: dict) -> None:
        root = options.get("path")
        topic = options.get("subscribe")
        if not root or not topic:
            raise ValueError("kafkasim requires path and subscribe options")
        self.topic = topic
        self.dir = _os.path.join(root, topic)
        self.starting = options.get("startingoffsets", options.get("startingOffsets", "earliest"))
        cap = options.get("maxoffsetspertrigger", options.get("maxOffsetsPerTrigger"))
        self.max_per_trigger = int(cap) if cap else None

    # -- partition-log helpers (module-level, shared with the parallel
    # reader) --------------------------------------------------------------

    def _partitions(self) -> list[int]:
        return _kafka_partitions(self.dir)

    def _end_offsets(self) -> dict[str, int]:
        return _kafka_end_offsets(self.dir)

    def _read_slice(self, part: int, lo: int, hi: int):
        return _kafka_read_slice(self.dir, self.topic, part, lo, hi)

    # -- stream-reader contract -----------------------------------------

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return self._end_offsets()
        if isinstance(self.starting, str) and self.starting.strip().startswith("{"):
            spec = _json.loads(self.starting)
            per_part = spec.get(self.topic, {})
            return {
                str(p): int(per_part.get(str(p), 0)) for p in self._partitions()
            }
        return {str(p): 0 for p in self._partitions()}

    def _apportion(self, start: dict, end: dict) -> dict:
        """Cap total consumed offsets at maxOffsetsPerTrigger, split
        proportionally to per-partition lag (Spark Kafka rate-limit)."""
        if self.max_per_trigger is None:
            return end
        lags = {p: max(0, end.get(p, 0) - start.get(p, 0)) for p in end}
        total = sum(lags.values())
        if total <= self.max_per_trigger:
            return end
        capped, assigned = {}, 0
        for p in sorted(lags, key=int):
            share = int(self.max_per_trigger * lags[p] / total)
            capped[p] = start.get(p, 0) + min(lags[p], share)
            assigned += capped[p] - start.get(p, 0)
        leftover = self.max_per_trigger - assigned
        for p in sorted(lags, key=int):
            if leftover <= 0:
                break
            room = (start.get(p, 0) + lags[p]) - capped[p]
            take = min(room, leftover)
            capped[p] += take
            leftover -= take
        return capped

    def read(self, start: dict):
        # never move an offset BACKWARD: a startingOffsets value beyond the
        # current partition end (or a shrunk log) must not regress the
        # checkpoint, or rows the user configured to skip would re-emit
        # once the producer catches up (Kafka treats out-of-range starts
        # as data loss, never as a rewind)
        end = self._apportion(start, self._end_offsets())
        end = {p: max(hi, start.get(p, 0)) for p, hi in end.items()}
        rows = []
        for p_str, hi in sorted(end.items(), key=lambda kv: int(kv[0])):
            lo = start.get(p_str, 0)
            if hi > lo:
                rows.extend(self._read_slice(int(p_str), lo, hi))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for p_str, hi in sorted(end.items(), key=lambda kv: int(kv[0])):
            lo = start.get(p_str, 0)
            if hi > lo:
                rows.extend(self._read_slice(int(p_str), lo, hi))
        return iter(rows)

    def commit(self, end) -> None:
        pass  # the checkpoint owns offsets (reference K5: no hand-commit)


class _KafkaSlice(InputPartition):
    """One (partition, offset-range) read task, pickled to an executor."""

    def __init__(self, topic_dir: str, topic: str, part: int, lo: int, hi: int):
        self.topic_dir = topic_dir
        self.topic = topic
        self.part = part
        self.lo = lo
        self.hi = hi


class KafkaSimParallelStreamReader(DataSourceStreamReader):
    """Executor-parallel kafkasim reader (``parallel=true`` option).

    Same topic-directory contract and offset semantics as
    :class:`KafkaSimStreamReader`, but reads run as one task per Kafka
    partition ON EXECUTORS (``partitions(start, end)`` → per-partition
    ``_KafkaSlice``), exactly like the real JVM Kafka source — the driver
    only lists end offsets.  This removes the simple reader's driver-side
    decode ceiling (the sustained-load cap documented in COVERAGE.md);
    the simple reader remains the default because availableNow-style
    drain loops in the existing contract tests exercise its prefetch
    path.

    maxOffsetsPerTrigger is apportioned in ``latestOffset`` against the
    last planned end; after a checkpoint restart the first batch
    re-baselines from the checkpointed start seen in ``partitions``
    (rate accuracy resumes one batch later — same behavior as Spark's
    Kafka source under admission-control restart).
    """

    def __init__(self, options: dict) -> None:
        root = options.get("path")
        topic = options.get("subscribe")
        if not root or not topic:
            raise ValueError("kafkasim requires path and subscribe options")
        self.topic = topic
        self.dir = _os.path.join(root, topic)
        self.starting = options.get(
            "startingoffsets", options.get("startingOffsets", "earliest")
        )
        cap = options.get("maxoffsetspertrigger", options.get("maxOffsetsPerTrigger"))
        self.max_per_trigger = int(cap) if cap else None
        self._progress: dict | None = None

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return _kafka_end_offsets(self.dir)
        if isinstance(self.starting, str) and self.starting.strip().startswith("{"):
            spec = _json.loads(self.starting)
            per_part = spec.get(self.topic, {})
            return {
                str(p): int(per_part.get(str(p), 0))
                for p in _kafka_partitions(self.dir)
            }
        return {str(p): 0 for p in _kafka_partitions(self.dir)}

    def _apportion(self, start: dict, end: dict) -> dict:
        if self.max_per_trigger is None:
            return end
        lags = {p: max(0, end.get(p, 0) - start.get(p, 0)) for p in end}
        total = sum(lags.values())
        if total <= self.max_per_trigger:
            return end
        capped, assigned = {}, 0
        for p in sorted(lags, key=int):
            share = int(self.max_per_trigger * lags[p] / total)
            capped[p] = start.get(p, 0) + min(lags[p], share)
            assigned += capped[p] - start.get(p, 0)
        leftover = self.max_per_trigger - assigned
        for p in sorted(lags, key=int):
            if leftover <= 0:
                break
            room = (start.get(p, 0) + lags[p]) - capped[p]
            take = min(room, leftover)
            capped[p] += take
            leftover -= take
        return capped

    def latestOffset(self) -> dict:
        start = self._progress if self._progress is not None else self.initialOffset()
        end = self._apportion(start, _kafka_end_offsets(self.dir))
        # never move an offset backward (same contract as the simple reader)
        end = {p: max(hi, start.get(p, 0)) for p, hi in end.items()}
        self._progress = end
        return end

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # re-baseline rate limiting from the authoritative (checkpointed)
        # start on the first batch after a restart
        if self._progress is None or any(
            self._progress.get(p, 0) < hi for p, hi in end.items()
        ):
            self._progress = dict(end)
        return [
            _KafkaSlice(self.dir, self.topic, int(p), start.get(p, 0), hi)
            for p, hi in sorted(end.items(), key=lambda kv: int(kv[0]))
            if hi > start.get(p, 0)
        ]

    def read(self, partition: _KafkaSlice):
        return iter(
            _kafka_read_slice(
                partition.topic_dir,
                partition.topic,
                partition.part,
                partition.lo,
                partition.hi,
            )
        )

    def commit(self, end) -> None:
        pass  # the checkpoint owns offsets (reference K5: no hand-commit)


class KafkaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkasim"

    def schema(self):
        return KAFKA_SCHEMA

    def streamReader(self, schema):
        if str(self.options.get("parallel", "")).lower() in ("1", "true"):
            return KafkaSimParallelStreamReader(self.options)
        # raise PySparkNotImplementedError so the runner falls back to
        # simpleStreamReader (pyspark.sql.datasource_internal._streamReader)
        return super().streamReader(schema)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return KafkaSimStreamReader(self.options)


def register_all(spark) -> None:
    """Register every connector in this module on a session."""
    for src in (
        QQWryDataSource,
        ShardSinkDataSource,
        ReplayDataSource,
        KafkaSimDataSource,
    ):
        spark.dataSource.register(src)
