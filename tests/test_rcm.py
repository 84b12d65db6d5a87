"""Remote-config poll loop (reference config_manager/rcm.go:8-19 +
cmd/clickhouse_sinker_nali/main.go:306-330): poll → diff → stop/start only
the affected tasks, resuming from the checkpoint so no rows are lost
across a restart."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from clickhouse_sinker_nali_spark.config import SinkerConfig, load_config
from clickhouse_sinker_nali_spark.streaming.rcm import (
    ConfigWatcher,
    LocalFileConfManager,
    task_fingerprint,
)


def _cfg_dict(name: str, dims: list[dict], topic: str = "t") -> dict:
    return {
        "clickhouse": {"hosts": [["h1"]], "db": "default"},
        "kafka": {"brokers": "b:9092"},
        "tasks": [
            {"name": name, "topic": topic, "tableName": name, "dims": dims}
        ],
    }


DIMS_V1 = [{"name": "id", "type": "Int64"}, {"name": "name", "type": "String"}]
DIMS_V2 = DIMS_V1 + [{"name": "extra", "type": "Float64"}]


def test_fingerprint_sensitive_to_pipeline_shape():
    a = load_config(_cfg_dict("t1", DIMS_V1)).tasks[0]
    b = load_config(_cfg_dict("t1", DIMS_V1)).tasks[0]
    c = load_config(_cfg_dict("t1", DIMS_V2)).tasks[0]
    d = load_config(_cfg_dict("t1", DIMS_V1, topic="other")).tasks[0]
    assert task_fingerprint(a) == task_fingerprint(b)
    assert task_fingerprint(a) != task_fingerprint(c)
    assert task_fingerprint(a) != task_fingerprint(d)


@dataclass
class _FakeQuery:
    stopped: bool = False

    def stop(self) -> None:
        self.stopped = True

    def awaitTermination(self, timeout=None) -> bool:  # noqa: N802
        return True


class _DictManager:
    def __init__(self, cfg: dict) -> None:
        self.cfg = cfg

    def get_config(self) -> SinkerConfig:
        return load_config(self.cfg)


def test_poll_diff_apply_actions():
    mgr = _DictManager(_cfg_dict("t1", DIMS_V1))
    started: list[str] = []

    def start_task(cfg):
        started.append(cfg.name)
        return _FakeQuery()

    w = ConfigWatcher(manager=mgr, start_task=start_task)
    assert w.poll_once() == {"t1": "started"}
    assert w.poll_once() == {}  # unchanged config touches nothing
    q1 = w.running["t1"]

    mgr.cfg = _cfg_dict("t1", DIMS_V2)  # dims change → restart
    assert w.poll_once() == {"t1": "restarted"}
    assert q1.stopped and w.restarts == 1 and started == ["t1", "t1"]

    mgr.cfg["tasks"] = []  # task removed → stop
    q2 = w.running["t1"]
    assert w.poll_once() == {"t1": "stopped"}
    assert q2.stopped and not w.running


def test_dims_change_mid_stream_without_losing_rows(spark, tmp_path):
    """The verdict's done-gate: swap the config file mid-stream; the
    watcher restarts the task with the widened dims and every message —
    before, during, and after the restart — lands exactly once."""
    from clickhouse_sinker_nali_spark.streaming.pipeline import (
        build_file_source,
        start_pipeline,
    )
    from clickhouse_sinker_nali_spark.streaming.sinks import ParquetSink

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    cfg_path = tmp_path / "sinker.json"
    cfg_path.write_text(json.dumps(_cfg_dict("t1", DIMS_V1)))

    def emit(batch: str, ids: range, extra: bool) -> None:
        lines = [
            json.dumps(
                {"id": i, "name": f"n{i}", **({"extra": i * 0.5} if extra else {})}
            )
            for i in ids
        ]
        (src / f"{batch}.jsonl").write_text("\n".join(lines) + "\n")

    sink = ParquetSink(path=str(out))

    def start_task(task_cfg):
        return start_pipeline(
            spark,
            task_cfg,
            build_file_source(spark, str(src)),
            sink,
            str(ckpt),
        )

    watcher = ConfigWatcher(
        manager=LocalFileConfManager(str(cfg_path)), start_task=start_task
    )

    def wait_rows(n: int, timeout: float = 90.0) -> int:
        deadline = time.time() + timeout
        count = -1
        while time.time() < deadline:
            try:
                count = (
                    spark.read.option("mergeSchema", "true")
                    .parquet(str(out))
                    .count()
                )
            except Exception:
                count = 0
            if count >= n:
                return count
            time.sleep(0.5)
        return count

    try:
        emit("b0", range(0, 5), extra=False)
        assert watcher.poll_once() == {"t1": "started"}
        assert wait_rows(5) == 5

        # config push widens dims; b1 is in flight around the restart
        cfg_path.write_text(json.dumps(_cfg_dict("t1", DIMS_V2)))
        emit("b1", range(5, 10), extra=True)
        assert watcher.poll_once() == {"t1": "restarted"}
        emit("b2", range(10, 15), extra=True)
        assert wait_rows(15) == 15
    finally:
        watcher.stop()

    df = spark.read.option("mergeSchema", "true").parquet(str(out))
    rows = df.collect()
    ids = sorted(r.id for r in rows)
    assert ids == list(range(15))  # nothing lost, nothing duplicated
    by_id = {r.id: r for r in rows}
    # rows ingested after the restart carry the widened column
    for i in range(10, 15):
        assert by_id[i].extra == i * 0.5
