"""Dynamic-schema mode: detect new JSON keys → ALTER TABLE → restart query.

Re-expresses the reference's §3.3 DDL path (SURVEY.md): a parse worker
noticing unknown keys quiesces the pipeline, flushes in-flight data, issues
``ALTER TABLE ... ADD COLUMN IF NOT EXISTS`` for each new key (type
inferred from the first value), and restarts the task with the widened
schema (reference parser/fastjson.go:213-237,302-340;
task/task.go:119-137,300-322,364-377; output/clickhouse.go:369-460).

Spark shape: inside ``foreachBatch``, diff a sampled key-set against the
known schema; on new keys, stop the query after the epoch completes, apply
DDL, rebuild the parse projection, restart from the checkpoint — no data
loss because offsets for the quiesced epoch were never committed.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..parsers import infer_internal_type
from ..schema import DYNAMIC_NEWKEY_CH_TYPE, InternalType, TableSchema


@dataclass
class NewKeyDetector:
    """White/black-regexp-filtered new-key detection with a maxDims cap
    (reference config/config.go:130-140, parser/fastjson.go:222-233)."""

    known: set[str]
    white_list: str = ""
    black_list: str = ""
    max_dims: int = 0  # 0 = unlimited

    def __post_init__(self) -> None:
        self._white = re.compile(self.white_list) if self.white_list else None
        self._black = re.compile(self.black_list) if self.black_list else None

    def admit(self, key: str) -> bool:
        if key in self.known:
            return False
        if self._white and not self._white.search(key):
            return False
        if self._black and self._black.search(key):
            return False
        if self.max_dims and len(self.known) >= self.max_dims:
            return False
        return True

    def detect(self, df: DataFrame, value_col: str = "value", sample: int = 1024) -> dict[str, InternalType]:
        """Sample messages from a micro-batch and infer types for new keys.

        First-value-wins type inference, the reference's rule.  The sample
        is a ``limit`` — executed distributed, only ``sample`` rows ever
        reach the driver.
        """
        rows = df.select(value_col).limit(sample).collect()
        found: dict[str, InternalType] = {}
        for row in rows:
            try:
                obj = json.loads(row[0])
            except (TypeError, ValueError):
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                if k in found or not self.admit(k):
                    continue
                it = infer_internal_type(v)
                if it is not InternalType.UNKNOWN:
                    found[k] = it
        return found


# ANSI twin of DYNAMIC_NEWKEY_CH_TYPE, used when the ALTER round-trip runs
# against a plain-SQL JDBC endpoint (integration tests use embedded Derby);
# arrays have no ANSI type and are stored serialized
_DYNAMIC_NEWKEY_ANSI_TYPE: dict[InternalType, str] = {
    InternalType.INT: "BIGINT",
    InternalType.FLOAT: "DOUBLE",
    InternalType.STRING: "VARCHAR(4000)",
    InternalType.DATETIME: "TIMESTAMP",
    InternalType.INT_ARRAY: "VARCHAR(4000)",
    InternalType.FLOAT_ARRAY: "VARCHAR(4000)",
    InternalType.STRING_ARRAY: "VARCHAR(4000)",
    InternalType.DATETIME_ARRAY: "VARCHAR(4000)",
}


def alter_statements(
    db: str,
    table: str,
    new_keys: dict[str, InternalType],
    on_cluster: str = "",
    dist_tables: list[str] | None = None,
    dialect: str = "clickhouse",
) -> list[str]:
    """Sorted ALTER DDL for the new keys (reference output/clickhouse.go:369-460).

    Distributed-table recreation is emitted as DROP+CREATE AS pattern
    statements (the reference drops and recreates Distributed wrappers,
    output/clickhouse_util.go:123-139).

    ``dialect="ansi"`` emits unquoted single-table ANSI DDL (no backticks,
    no IF NOT EXISTS, ANSI type names) so the same orchestration can be
    driven end-to-end against any plain JDBC database.

    ``dialect="clickhouse"`` delegates to the byte-golden wire dialect
    (``chdialect.alter_sql`` / ``chdialect.recreate_dist_sql``) — the sink
    path must emit NO hand-rolled CH SQL of its own (guarded by
    ``tests/test_sql_dialect_guard.py``).  Distributed wrappers are only
    recreated in cluster mode, as in the reference
    (output/clickhouse.go:436-456 runs under ``chCfg.Cluster != ""``).
    """
    if dialect == "ansi":
        return [
            f"ALTER TABLE {table} ADD COLUMN {key} "
            f"{_DYNAMIC_NEWKEY_ANSI_TYPE[new_keys[key]]}"
            for key in sorted(new_keys)
        ]
    from .chdialect import alter_sql, recreate_dist_sql

    stmts = alter_sql(db, table, new_keys, cluster=on_cluster)
    if on_cluster and dist_tables:
        stmts += recreate_dist_sql(on_cluster, db, table, dist_tables)
    return stmts


@dataclass
class DynamicSchemaController:
    """Orchestrates detect → quiesce → DDL → restart across epochs.

    ``on_ddl`` executes statements (JDBC in production; recorded in tests);
    ``on_restart`` rebuilds + restarts the streaming query with the widened
    dims.  The controller is called from foreachBatch; when new keys are
    found the current epoch still writes with the OLD schema (the reference
    also flushes in-flight rows pre-ALTER) and the restart happens after.
    """

    schema: TableSchema
    detector: NewKeyDetector
    db: str
    table: str
    on_ddl: object = None
    on_restart: object = None
    pending: dict[str, InternalType] = field(default_factory=dict)

    def check_batch(self, raw_df: DataFrame) -> bool:
        """Returns True when a schema change was triggered."""
        new_keys = self.detector.detect(raw_df)
        if not new_keys:
            return False
        self.pending = new_keys
        stmts = alter_statements(self.db, self.table, new_keys)
        if self.on_ddl is not None:
            self.on_ddl(stmts)
        for key, it in sorted(new_keys.items()):
            self.detector.known.add(key)
            self.schema.columns.append(
                _newkey_spec(key, it)
            )
        if self.on_restart is not None:
            self.on_restart(self.schema)
        return True


def _newkey_spec(key: str, it: InternalType):
    from ..schema import ColumnSpec

    return ColumnSpec(name=key, ch_type=DYNAMIC_NEWKEY_CH_TYPE[it])


class SchemaChanged(Exception):
    """Raised inside foreachBatch to abort the epoch that discovered new
    keys: the epoch never commits, so its offsets replay after the restart
    and every row is (re)written with the widened schema — the Spark
    equivalent of the reference quiescing rows while ``cntNewKeys != 0``
    (reference task/task.go:323-329) instead of writing them pre-ALTER.
    """


def run_with_schema_evolution(
    spark,
    cfg,
    source_factory,
    sink,
    checkpoint_dir: str,
    controller: DynamicSchemaController,
    max_restarts: int = 8,
) -> int:
    """Drive a streaming task through dynamic schema changes (§3.3 path).

    Loop: run the pipeline (availableNow) with the CURRENT schema; when a
    micro-batch surfaces new keys, fail that epoch via :class:`SchemaChanged`,
    apply DDL + widen (already done by ``controller.check_batch``), and
    restart from the checkpoint — the failed epoch replays under the new
    schema.  Returns the number of restarts performed.

    ``source_factory() -> DataFrame`` must build a fresh streaming source
    each attempt (streaming DataFrames are single-use across restarts).
    """
    import os as _os

    from .pipeline import transform

    restarts = 0
    while True:
        tripped: dict[str, bool] = {"changed": False}

        def write_batch(raw_df, epoch_id: int) -> None:
            if controller.check_batch(raw_df):
                tripped["changed"] = True
                raise SchemaChanged(f"epoch {epoch_id}: new keys detected")
            typed = transform(raw_df, cfg)
            sink.write(typed, epoch_id)

        raw = source_factory()
        query = (
            raw.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", _os.path.join(checkpoint_dir, cfg.name))
            .queryName(cfg.name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination()
            return restarts
        except Exception:
            query.stop()
            if not tripped["changed"]:
                raise
            # controller already widened cfg's schema via on_restart wiring;
            # sync the TaskConfig dims to the widened schema
            cfg.dims = [
                {"name": c.name, "type": c.ch_type, "sourcename": c.source_name}
                for c in controller.schema.columns
            ]
            restarts += 1
            if restarts > max_restarts:
                raise RuntimeError("too many schema-change restarts")
