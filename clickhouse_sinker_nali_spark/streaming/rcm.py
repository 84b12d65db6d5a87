"""Remote-config manager poll loop: poll → diff → stop/start affected tasks.

Twin of the reference's config manager surface (reference
``config_manager/rcm.go:8-19``: an interface over Nacos/Consul/etcd/ZK
returning the current config) and its apply loop (reference
``cmd/clickhouse_sinker_nali/main.go:306-330``: every 10 s fetch the
config, diff against the running state, and stop/start only the affected
tasks).  The scheduling half of Nacos (``nacos.go:293-397`` — snake
assignment of tasks to instances by consumer lag) is superseded by the
cluster manager per SURVEY §2.9 and is NOT reproduced.

No-data-loss contract: each task's streaming query checkpoints its own
offsets, so a stop → start with changed dims resumes from the committed
offset — rows in flight during the restart replay into the new pipeline
(the same mechanism §3.3 uses for dynamic-schema restarts).
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from typing import Callable, Protocol

from ..config import SinkerConfig, load_config
from .pipeline import TaskConfig


class RemoteConfManager(Protocol):
    """The rcm.go contract, reduced to what the data plane needs: fetch the
    current config.  Register/Publish/Assignment are control-plane concerns
    owned by the cluster manager in a Spark deployment."""

    def get_config(self) -> SinkerConfig: ...


@dataclass
class LocalFileConfManager:
    """Config manager over a local JSON file (the reference's non-Nacos
    mode, which it also polls — main.go:205-231)."""

    path: str

    def get_config(self) -> SinkerConfig:
        return load_config(self.path)


def task_fingerprint(cfg: TaskConfig) -> str:
    """The identity of a task's *pipeline-shaping* config: any change here
    requires a query restart; anything else (e.g. ops knobs) does not."""
    return json.dumps(
        {
            "topic": cfg.topic,
            "table": cfg.table,
            "parser": cfg.parser,
            "dims": cfg.dims,
            "csv_format": cfg.csv_format,
            "delimiter": cfg.delimiter,
            "earliest": cfg.earliest,
            "flush_interval_s": cfg.flush_interval_s,
            "buffer_size": cfg.buffer_size,
            "time_unit": cfg.time_unit,
            "sharding_key": cfg.sharding_key,
            "sharding_policy": cfg.sharding_policy,
            "exclude_columns": cfg.exclude_columns,
        },
        sort_keys=True,
    )


@dataclass
class ConfigWatcher:
    """Poll-diff-apply controller for the running task set.

    ``start_task(task_cfg) -> query`` builds and starts one streaming
    query (source + transform + sink wiring is the caller's — tests use
    file sources, production uses build_kafka_source/start_pipeline).
    ``poll_once`` is the 10-second body of main.go:306-330:

    - task present remotely but not running       → start
    - task running but gone from the remote       → stop
    - fingerprint changed (dims, topic, parser…)  → stop, start with new cfg

    Unchanged tasks are never touched — the reference's applyAnotherConfig
    behaves the same so a fleet-wide config push doesn't restart the world.
    """

    manager: RemoteConfManager
    start_task: Callable[[TaskConfig], object]
    interval_s: float = 10.0
    running: dict[str, object] = field(default_factory=dict)
    fingerprints: dict[str, str] = field(default_factory=dict)
    restarts: int = field(default=0)
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)

    def poll_once(self) -> dict[str, str]:
        """One poll-diff-apply round; returns {task_name: action} for
        observability ('started' | 'restarted' | 'stopped')."""
        cfg = self.manager.get_config()
        remote = {t.name: t for t in cfg.tasks}
        actions: dict[str, str] = {}

        for name in list(self.running):
            if name not in remote:
                self._stop_task(name)
                actions[name] = "stopped"

        for name, task_cfg in remote.items():
            fp = task_fingerprint(task_cfg)
            if name not in self.running:
                self.running[name] = self.start_task(task_cfg)
                self.fingerprints[name] = fp
                actions[name] = "started"
            elif fp != self.fingerprints[name]:
                self._stop_task(name)
                self.running[name] = self.start_task(task_cfg)
                self.fingerprints[name] = fp
                self.restarts += 1
                actions[name] = "restarted"
        return actions

    def _stop_task(self, name: str) -> None:
        query = self.running.pop(name)
        self.fingerprints.pop(name, None)
        try:
            query.stop()
            # make the restart race-free: the checkpoint is released only
            # once the query fully terminates
            query.awaitTermination(60)
        except Exception:  # noqa: BLE001 — already-terminated queries are fine
            pass

    def start(self) -> None:
        def loop() -> None:
            # apply the config IMMEDIATELY at boot (the reference's
            # applyFirstConfig, main.go:394) — waiting a full interval
            # before the first poll would run zero tasks until then
            while True:
                try:
                    self.poll_once()
                except Exception:  # noqa: BLE001 — keep polling (rcm may be down)
                    pass
                if self._stop.wait(self.interval_s):
                    return

        self._stop.clear()
        self._thread = threading.Thread(target=loop, daemon=True, name="rcm-poll")
        self._thread.start()

    def stop(self, stop_tasks: bool = True) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if stop_tasks:
            for name in list(self.running):
                self._stop_task(name)
