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


def _kafka_initial_offsets(topic_dir: str, topic: str, starting) -> dict:
    """Resolve startingOffsets (earliest / latest / per-partition JSON)
    to a per-partition offset dict — shared by both readers."""
    if starting == "latest":
        return _kafka_end_offsets(topic_dir)
    if isinstance(starting, str) and starting.strip().startswith("{"):
        spec = _json.loads(starting)
        per_part = spec.get(topic, {})
        return {
            str(p): int(per_part.get(str(p), 0))
            for p in _kafka_partitions(topic_dir)
        }
    return {str(p): 0 for p in _kafka_partitions(topic_dir)}


def _kafka_apportion(start: dict, end: dict, cap: int | None) -> dict:
    """Cap total consumed offsets at ``cap`` (maxOffsetsPerTrigger),
    split proportionally to per-partition lag (Spark Kafka rate-limit) —
    shared by both readers."""
    if cap is None:
        return end
    lags = {p: max(0, end.get(p, 0) - start.get(p, 0)) for p in end}
    total = sum(lags.values())
    if total <= cap:
        return end
    capped, assigned = {}, 0
    for p in sorted(lags, key=int):
        share = int(cap * lags[p] / total)
        capped[p] = start.get(p, 0) + min(lags[p], share)
        assigned += capped[p] - start.get(p, 0)
    leftover = cap - assigned
    for p in sorted(lags, key=int):
        if leftover <= 0:
            break
        room = (start.get(p, 0) + lags[p]) - capped[p]
        take = min(room, leftover)
        capped[p] += take
        leftover -= take
    return capped


def _kafka_read_slice(
    topic_dir: str,
    topic: str,
    part: int,
    lo: int,
    hi: int,
    base_line: int = 0,
    base_byte: int = 0,
):
    """Decode rows [lo, hi) of one partition log — shared by the
    driver-side simple reader and the executor-side parallel reader.

    ``(base_line, base_byte)`` is a seek anchor at or below ``lo`` (the
    parallel reader's planner records byte positions at trigger
    boundaries): the scan seeks there and skips only ``lo - base_line``
    lines instead of re-reading the consumed prefix — per-trigger read
    cost then tracks the batch, not the log's lifetime size."""
    from datetime import datetime, timedelta

    rows = []
    # binary mode: the byte anchors come from binary counting, and
    # TextIOWrapper.seek only accepts opaque cookies from its own tell()
    # — seeking a text handle to a raw byte offset is undefined behavior
    with open(_os.path.join(topic_dir, f"partition-{part}.jsonl"), "rb") as f:
        if base_byte:
            f.seek(base_byte)
        for off, line in enumerate(f, start=base_line):
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
        return _kafka_initial_offsets(self.dir, self.topic, self.starting)

    def _apportion(self, start: dict, end: dict) -> dict:
        return _kafka_apportion(start, end, self.max_per_trigger)

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


# Upper bound on catch-up slices per Kafka partition (see
# KafkaSimParallelStreamReader.partitions): bounds the total line-skip
# re-scan of shared-anchor chunks while still fanning a post-restart
# backlog batch across the cluster.
_MAX_SLICES_PER_PART = 32


class _KafkaSlice(InputPartition):
    """One (partition, offset-range) read task, pickled to an executor.
    ``(base_line, base_byte)`` is the planner's seek anchor at or below
    ``lo`` (see ``_kafka_read_slice``)."""

    def __init__(
        self,
        topic_dir: str,
        topic: str,
        part: int,
        lo: int,
        hi: int,
        base_line: int = 0,
        base_byte: int = 0,
    ):
        self.topic_dir = topic_dir
        self.topic = topic
        self.part = part
        self.lo = lo
        self.hi = hi
        self.base_line = base_line
        self.base_byte = base_byte


class KafkaSimParallelStreamReader(DataSourceStreamReader):
    """Executor-parallel kafkasim reader (``parallel=true`` option).

    Same topic-directory contract and offset semantics as
    :class:`KafkaSimStreamReader`, but reads run as one task per Kafka
    partition ON EXECUTORS (``partitions(start, end)`` → per-partition
    ``_KafkaSlice``), exactly like the real JVM Kafka source — the driver
    only lists end offsets.  This removes the simple reader's driver-side
    decode ceiling (the sustained-load cap documented in COVERAGE.md) and
    is the DEFAULT since r6; ``parallel=false`` opts back into the simple
    reader, whose read(start) receives the start offset and therefore
    caps even a fresh query's first batch (pinned by the drain-loop
    contract tests).

    maxOffsetsPerTrigger is apportioned in ``latestOffset`` against the
    last planned end.  The python stream API passes NO start offset to
    ``latestOffset`` (unlike the JVM SupportsAdmissionControl surface),
    so the first latestOffset of a (re)started query is admission-
    UNCAPPED: it returns the true log end, never an earliest-baselined
    guess — a capped guess could fall BELOW a committed offset after a
    clean restart, regressing the offset log and re-emitting the
    committed prefix as duplicates (r5 ADVICE, high).  The rate baseline
    instead comes from the authoritative offsets Spark itself hands to
    ``partitions()``/``initialOffset()``; caps engage from the next
    batch on (the documented admission-control restart caveat), and the
    one uncapped catch-up batch executes as bounded parallel slices,
    not one task per partition.

    Per-trigger planning cost is O(appended bytes), not O(log size): end
    offsets are counted INCREMENTALLY (seek to the last counted byte,
    count only complete new lines), and byte positions at counted
    boundaries are kept (one small entry per trigger, pruned at commit)
    so executor read tasks seek to an anchor at-or-below their start
    line instead of re-scanning the consumed prefix — without this, a
    long-running stream's per-trigger cost grows with total log size and
    eventually exceeds the trigger interval with no real backlog.
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
        # (r6 ADVICE #3) optional consumer-group id: enables the sidecar
        # rate baseline so even the FIRST batch after a clean restart is
        # admission-capped.  Like real Kafka group ids, distinct queries
        # reading one topic must use distinct groups — a shared sidecar
        # would let one query's baseline steer another's.
        group = options.get(
            "groupid", options.get("groupId", options.get("group.id"))
        )
        self._baseline_path = (
            _os.path.join(self.dir, f".baseline-{group}.json") if group else None
        )
        self._progress: dict | None = None
        # part -> (bytes_counted, lines_counted): incremental tail state
        self._tail: dict[str, tuple[int, int]] = {}
        # part -> {line_no: byte_off} at counted boundaries (seek anchors)
        self._anchors: dict[str, dict[int, int]] = {}
        # The reader lives in a python runner process the JVM spawns — a
        # debugger can't reach it, so the protocol call sequence (which
        # Spark version / trigger mode decides) is observable only via
        # this env-gated append log.  Used by the contract tests.  Read
        # ONCE here: call sites guard on the attribute so the per-trigger
        # hot path pays neither the env lookup nor f-string rendering.
        self._trace_path = _os.environ.get("KAFKASIM_PROTO_TRACE")

    def _trace(self, msg: str) -> None:
        with open(self._trace_path, "a") as f:
            f.write(f"{id(self) % 100000} {msg}\n")

    def _save_baseline(self, planned: dict) -> None:
        """Persist the high-water PLANNED offsets (atomic tmp+rename).

        Written BEFORE every latestOffset return and on every partitions()
        re-baseline, so the sidecar is always >= any end Spark's offset
        log can hold as a committed start — which is what makes capping a
        restarted query's first batch from it regression-safe (the r5
        offset-regression bug was capping from an EARLIEST baseline, which
        could fall below the committed start).  Purely advisory: on any
        write failure the sidecar is REMOVED (never left stale — a
        stale-low baseline would reintroduce the regression), so the next
        restart's first batch is uncapped, the documented pre-sidecar
        behavior."""
        if not self._baseline_path:
            return
        try:
            tmp = f"{self._baseline_path}.tmp.{_os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(planned, f)
            _os.replace(tmp, self._baseline_path)
        except OSError:
            # A failed save must not leave a STALE baseline behind: capping
            # a later restart from a stale-LOW baseline could plan an end
            # below the committed offset — the r5 offset-regression class
            # (r7 self-review finding).  Drop the sidecar entirely — a
            # missing file degrades to the documented uncapped restart; if
            # even the delete fails, disable the sidecar for this reader's
            # lifetime so no future save can resurrect the stale file.
            try:
                _os.remove(self._baseline_path)
            except FileNotFoundError:
                pass
            except OSError:
                self._baseline_path = None

    def _load_baseline(self) -> dict | None:
        if not self._baseline_path:
            return None
        try:
            with open(self._baseline_path) as f:
                return {str(k): int(v) for k, v in _json.load(f).items()}
        except (OSError, ValueError):
            return None

    def initialOffset(self) -> dict:
        off = _kafka_initial_offsets(self.dir, self.topic, self.starting)
        # Fresh start (Spark only calls this when there is no checkpoint):
        # baseline rate limiting here so the FIRST latestOffset can apply
        # maxOffsetsPerTrigger.  After a checkpoint restart this is never
        # called, _progress stays None, and latestOffset knows it must not
        # trust an earliest-based baseline (see latestOffset).
        if self._progress is None:
            self._progress = dict(off)
        if self._trace_path:
            self._trace(f"initialOffset -> {off}")
        return off

    def _end_offsets(self) -> dict[str, int]:
        out = {}
        for p in _kafka_partitions(self.dir):
            ps = str(p)
            path = _os.path.join(self.dir, f"partition-{p}.jsonl")
            bytes_done, lines = self._tail.get(ps, (0, 0))
            size = _os.path.getsize(path)
            if size > bytes_done:
                with open(path, "rb") as f:
                    f.seek(bytes_done)
                    chunk = f.read(size - bytes_done)
                # count only COMPLETE lines — the producer may be mid-append
                last_nl = chunk.rfind(b"\n")
                if last_nl >= 0:
                    lines += chunk[: last_nl + 1].count(b"\n")
                    bytes_done += last_nl + 1
                self._tail[ps] = (bytes_done, lines)
            out[ps] = lines
            self._anchors.setdefault(ps, {0: 0})[lines] = bytes_done
        return out

    def _anchor_for(self, part: str, lo: int) -> tuple[int, int]:
        """Largest recorded (line, byte) boundary at or below ``lo``."""
        anchors = self._anchors.get(part) or {0: 0}
        base_line = max((ln for ln in anchors if ln <= lo), default=0)
        return base_line, anchors.get(base_line, 0)

    def latestOffset(self) -> dict:
        if self._progress is None:
            initial = _kafka_initial_offsets(self.dir, self.topic, self.starting)
            base = self._load_baseline()
            if base is not None:
                # Sidecar restart path (r6 ADVICE #3): the persisted
                # high-water planned offsets are >= any committed start
                # (see _save_baseline), so apportioning the cap from them
                # can never regress the offset log — and a deep backlog
                # after a clean restart drains as CAPPED batches instead
                # of one unbounded catch-up batch hitting the sink.
                for p, lo in initial.items():
                    base[p] = max(base.get(p, 0), lo)
                true_end = self._end_offsets()
                for p in base:
                    true_end.setdefault(p, 0)
                end = _kafka_apportion(base, true_end, self.max_per_trigger)
                end = {p: max(hi, base.get(p, 0)) for p, hi in end.items()}
                self._progress = dict(end)
                self._save_baseline(end)
                if self._trace_path:
                    self._trace(
                        f"latestOffset (sidecar restart base={base}) -> {end}"
                    )
                return end
            # First latestOffset after a CHECKPOINT RESTART with no pending
            # batch to replay and NO sidecar baseline: the committed start
            # lives in Spark's offset log (handed to partitions(), never to
            # us), so an earliest-based baseline under maxOffsetsPerTrigger
            # could return an end BELOW the committed offset — the offset
            # log would regress and the committed prefix would re-emit as
            # duplicates.  Return the uncapped true end instead: the log
            # only grows, so end >= any committed start, and rate accuracy
            # resumes one batch later (partitions() re-baselines from the
            # authoritative start) — the documented admission-control
            # restart caveat.
            end = self._end_offsets()
            # clamp UP to the configured start (earliest=0 makes this a
            # no-op): startingOffsets JSON/latest can sit ahead of the
            # physical log end, and committed offsets inherit that floor
            # through the max() guard below — returning the raw log end
            # would regress below both.  A clamp can only RAISE end, so
            # the log-only-grows safety argument is unaffected.
            end = {p: max(hi, initial.get(p, 0)) for p, hi in end.items()}
            for p, lo in initial.items():
                end.setdefault(p, lo)
            self._progress = dict(end)
            self._save_baseline(end)
            if self._trace_path:
                self._trace(f"latestOffset (uncapped restart) -> {end}")
            return end
        start = self._progress
        end = _kafka_apportion(start, self._end_offsets(), self.max_per_trigger)
        # never move an offset backward (same contract as the simple reader)
        end = {p: max(hi, start.get(p, 0)) for p, hi in end.items()}
        self._progress = end
        self._save_baseline(end)
        if self._trace_path:
            self._trace(f"latestOffset start={start} -> {end}")
        return end

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # re-baseline rate limiting from the authoritative (checkpointed)
        # start/end on the first batch after a restart — element-wise max,
        # so neither a replayed batch nor a stale in-memory cursor can pull
        # the rate baseline below an offset Spark has already committed
        base = self._progress or {}
        merged = {
            p: max(base.get(p, 0), start.get(p, 0), hi) for p, hi in end.items()
        }
        for p, lo in start.items():
            if p not in merged:
                merged[p] = max(base.get(p, 0), lo)
        self._progress = merged
        self._save_baseline(merged)
        # Slice granularity: the first batch after a restart is admission-
        # UNCAPPED when no sidecar group id is configured (see
        # latestOffset), so a daemon restarting over a deep backlog gets
        # one huge batch — chunk each Kafka partition's range
        # into bounded slices so that batch still executes as many small
        # parallel tasks (the real Kafka source's minPartitions shape)
        # instead of one ballooning task per partition.  Chunks after the
        # first share the trigger-boundary seek anchor and skip lines up to
        # their own start — a cheap byte scan vs. the JSON decode they avoid
        # re-doing; slice count per partition is bounded so the skip total
        # stays linear-ish in backlog size.
        per_cap = (
            max(1, self.max_per_trigger // max(1, len(end)))
            if self.max_per_trigger
            else None
        )
        out = []
        for p, hi in sorted(end.items(), key=lambda kv: int(kv[0])):
            lo = start.get(p, 0)
            if hi <= lo:
                continue
            chunk = hi - lo
            if per_cap is not None and chunk > per_cap:
                chunk = max(per_cap, -(-(hi - lo) // _MAX_SLICES_PER_PART))
            for s_lo in range(lo, hi, chunk):
                s_hi = min(s_lo + chunk, hi)
                base_line, base_byte = self._anchor_for(p, s_lo)
                out.append(
                    _KafkaSlice(
                        self.dir, self.topic, int(p), s_lo, s_hi,
                        base_line, base_byte,
                    )
                )
        if self._trace_path:
            self._trace(
                f"partitions start={start} end={end} -> "
                f"{[(sl.part, sl.lo, sl.hi) for sl in out]}"
            )
        return out

    def read(self, partition: _KafkaSlice):
        return iter(
            _kafka_read_slice(
                partition.topic_dir,
                partition.topic,
                partition.part,
                partition.lo,
                partition.hi,
                partition.base_line,
                partition.base_byte,
            )
        )

    def commit(self, end) -> None:
        if self._trace_path:
            self._trace(f"commit {end}")
        # the checkpoint owns offsets (reference K5: no hand-commit);
        # prune seek anchors below the committed start, keeping the
        # newest at-or-below so the next batch still has its anchor
        for p, committed in (end or {}).items():
            anchors = self._anchors.get(str(p))
            if not anchors:
                continue
            keep_floor = max(
                (ln for ln in anchors if ln <= committed), default=0
            )
            self._anchors[str(p)] = {
                ln: b for ln, b in anchors.items() if ln >= keep_floor
            }


class KafkaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkasim"

    def schema(self):
        return KAFKA_SCHEMA

    def streamReader(self, schema):
        # The executor-parallel reader is the DEFAULT (r6): it is the real
        # Kafka source's execution shape — the driver only lists offsets,
        # decode runs as one task per partition slice on executors.
        # ``parallel=false`` keeps the driver-side SimpleDataSourceStreamReader,
        # whose prefetch path the availableNow drain-loop contract tests pin.
        if str(self.options.get("parallel", "true")).lower() in ("0", "false"):
            # raise PySparkNotImplementedError so the runner falls back to
            # simpleStreamReader (pyspark.sql.datasource_internal._streamReader)
            return super().streamReader(schema)
        return KafkaSimParallelStreamReader(self.options)

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
