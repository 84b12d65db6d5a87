"""ClickHouse wire-dialect surface: the EXACT SQL/DSN strings the sink
emits against a real ClickHouse cluster, plus the error-code → reconnect
decision table.

No ClickHouse server exists in this container, so this layer is the
contract the JDBC sink programs against: every string here is golden-tested
byte-for-byte against the formats the reference daemon produces
(`output/clickhouse.go`, `output/clickhouse_util.go`, `pool/conn.go`), so a
deployment pointed at a live cluster sends statements a ClickHouse server
has already accepted from the reference for years.  The Derby integration
tests (tests/test_jdbc_sink.py) prove the MECHANICS (transactions, ALTER,
replica rotation) over a live JDBC engine; this module pins the DIALECT.

Faithful quirks deliberately preserved (they are what the server actually
receives from the reference):
- `ALTER TABLE db.tbl  ADD COLUMN ...` carries a DOUBLE space when no
  cluster is configured (Go's ``%s`` of an empty onCluster string,
  output/clickhouse.go:369-460).
- the Distributed CREATE ends with a semicolon, the DROP does not
  (output/clickhouse_util.go:123-139).
- the system.tables probe regex escapes both the parens and the quotes
  (``Distributed\\(\\'...``, output/clickhouse.go:470).
- column names are backtick-quoted in INSERT/ALTER; db and table are not.
"""

from __future__ import annotations

from urllib.parse import quote

from ..schema import DYNAMIC_NEWKEY_CH_TYPE, InternalType

# reference config/config.go:165 — MaxBufferSize = 1 << 20
MAX_BUFFER_SIZE = 1 << 20

# ClickHouse error codes on which the reference rotates to another replica
# (reference output/clickhouse.go:46-48, quoting CH src/Common/ErrorCodes.cpp):
# TABLE_IS_READ_ONLY, UNKNOWN_STATUS_OF_INSERT, POCO_EXCEPTION.
REPLICA_SPECIFIC_ERROR_CODES = frozenset({242, 319, 1000})


class CHServerError(Exception):
    """A ClickHouse server exception with its numeric error code — the
    Python analog of ``clickhouse.Exception`` the reference unwraps in
    ``shouldReconnect`` (output/clickhouse_util.go:16-30)."""

    def __init__(self, code: int, message: str = ""):
        super().__init__(f"CH error {code}: {message}" if message else f"CH error {code}")
        self.code = code


_CODE_RE = None  # compiled lazily; module import stays cheap


def _extract_ch_code(err: Exception) -> int | None:
    """Best-effort ClickHouse error-code extraction from a wrapped error.

    Through JDBC/py4j the server exception arrives as text, not a typed
    object; ClickHouse prefixes every server error with
    ``Code: NNN. DB::Exception`` (and the JDBC driver preserves it), so the
    message is the reliable carrier.  The match is anchored to the
    DB::Exception shape — a bare ``Code: NNN`` substring from a
    non-ClickHouse layer (HTTP proxy text, a nested driver's own codes)
    must NOT be trusted for the no-rotate decision: misreading one as a
    non-replica server error would fail fast on what is really a
    connectivity problem.  Both server formats are accepted: the modern
    ``Code: NNN. DB::Exception: ...`` and the pre-21.x / legacy-JDBC
    ``Code: NNN, e.displayText() = DB::Exception: ...``.  Returns None
    when no server code is present (pure connectivity/driver errors).
    """
    global _CODE_RE
    if _CODE_RE is None:
        import re

        _CODE_RE = re.compile(
            r"\bCode:\s*(\d+)[.,]\s*(?:e\.displayText\(\)\s*=\s*)?DB::Exception\b"
        )
    m = _CODE_RE.search(str(err))
    return int(m.group(1)) if m else None


def should_reconnect(err: Exception) -> bool:
    """Reconnect decision for a failed write (output/clickhouse_util.go:16-30).

    A ClickHouse server exception reconnects ONLY on the replica-specific
    codes (242/319/1000): any other server code (syntax error, type
    mismatch, quota) would fail identically on every replica, so rotating
    is wasted work and hides the real error.  A NON-server error (network
    reset, driver failure, timeout) always reconnects — the connection
    itself is suspect.
    """
    if isinstance(err, CHServerError):
        return err.code in REPLICA_SPECIFIC_ERROR_CODES
    code = _extract_ch_code(err)
    if code is not None:
        return code in REPLICA_SPECIFIC_ERROR_CODES
    return True


# --------------------------------------------------------------------------
# DSN construction (pool/conn.go:128-162)
# --------------------------------------------------------------------------


def _query_escape(s: str) -> str:
    # Go's url.QueryEscape encodes a space as '+', unlike urllib's quote.
    return quote(s, safe="").replace("%20", "+")


def dsn_suffix(
    db: str,
    username: str,
    password: str,
    dsn_params: str = "",
    secure: bool = False,
    skip_verify: bool = False,
    max_buffer_size: int = MAX_BUFFER_SIZE,
) -> str:
    """The shared DSN query string every replica connection carries
    (pool/conn.go:134-141): credentials plus ``block_size=2*MaxBufferSize``
    — the large-insert-block setting that lets the server build full parts
    per INSERT instead of merging many small ones."""
    s = (
        f"?database={_query_escape(db)}&username={_query_escape(username)}"
        f"&password={_query_escape(password)}&block_size={2 * max_buffer_size}"
    )
    if dsn_params:
        s += "&" + dsn_params
    if secure:
        s += "&secure=true&skip_verify=" + ("true" if skip_verify else "false")
    return s


def replica_dsn(host_port: str, suffix: str) -> str:
    """Full native-protocol DSN for one replica (pool/conn.go:96)."""
    return f"tcp://{host_port}" + suffix


# --------------------------------------------------------------------------
# INSERT statements (output/clickhouse.go:341-354, :289-314)
# --------------------------------------------------------------------------


def insert_sql(db: str, table: str, columns: list[str]) -> str:
    """Prepared INSERT the metric sink runs each batch: backticked column
    list, positional params (output/clickhouse.go:341-354)."""
    quoted = ",".join(f"`{c}`" for c in columns)
    params = ",".join("?" for _ in columns)
    return f"INSERT INTO {db}.{table} ({quoted}) VALUES ({params})"


def series_insert_sql(db: str, table: str, series_columns: list[str]) -> str:
    """Prepared INSERT for the Prometheus series table — same shape,
    series dims lead with ``__series_id, labels`` (output/clickhouse.go:289-300)."""
    return insert_sql(db, f"{table}_series", series_columns)


# --------------------------------------------------------------------------
# Catalog probes (output/clickhouse_util.go:95-121, output/clickhouse.go:196-221,462-489)
# --------------------------------------------------------------------------


def select_columns_sql(db: str, table: str) -> str:
    """The auto-schema catalog scan (output/clickhouse.go:42,
    selectSQLTemplate) — lowercase keywords exactly as the reference sends
    them."""
    return (
        "select name, type, default_kind from system.columns "
        f"where database = '{db}' and table = '{table}'"
    )


def series_preload_sql(db: str, table: str, dist_table: str | None = None) -> str:
    """Seed query for the series dedup bitmap.

    Cluster mode reads through the FIRST Distributed wrapper of the series
    table so the preload sees every shard's series
    (output/clickhouse.go:199); single-node reads the local
    ``<table>_series`` (output/clickhouse.go:201)."""
    tbl = dist_table if dist_table else f"{table}_series"
    return f"SELECT __series_id FROM {db}.{tbl}"


def dist_tables_sql(db: str, cluster: str, table: str) -> str:
    """Find the Distributed wrappers of a local table
    (output/clickhouse.go:470-471).  The match() pattern escapes parens
    AND quotes — the argument is a ClickHouse re2 pattern inside a SQL
    string literal, so both layers need the backslashes."""
    return (
        "SELECT name FROM system.tables WHERE engine='Distributed' AND "
        f"database='{db}' AND match(create_table_query, "
        f"'Distributed\\(\\'{cluster}\\', \\'{db}\\', \\'{table}\\'\\)')"
    )


# --------------------------------------------------------------------------
# Schema-evolution DDL (output/clickhouse.go:369-460, clickhouse_util.go:123-139)
# --------------------------------------------------------------------------


def alter_sql(
    db: str,
    table: str,
    new_keys: dict[str, InternalType],
    cluster: str = "",
    prometheus_schema: bool = False,
    max_dims: int = 0,
    n_current_dims: int = 0,
) -> list[str]:
    """Sorted ``ALTER TABLE ... ADD COLUMN IF NOT EXISTS`` statements for
    the detected new keys (output/clickhouse.go:369-434).

    - ``maxDims`` quota: only ``max_dims - n_current_dims`` keys are
      admitted when a positive cap is configured; the rest are dropped
      (reference logs and stops iterating).  Faithful quirk: the quota is
      consumed per ITERATED key, before the Prometheus String filter
      (``i++`` precedes the type switch, output/clickhouse.go:389-392) —
      so in Prometheus mode a skipped non-String key still burns a slot.
    - Prometheus schema: ONLY String keys alter, and they target the
      ``_series`` table (labels live there; numeric dims never change).
    - Statements are sorted (``sort.Strings``) so replayed ALTERs apply in
      a deterministic order on every shard.
    - No cluster → Go formats an empty ``%s`` → double space (preserved).
    """
    on_cluster = f"ON CLUSTER {cluster}" if cluster else ""
    quota = (max_dims - n_current_dims) if max_dims > 0 else None
    if quota is not None and quota <= 0:
        return []
    stmts: list[str] = []
    n = 0
    for key, itype in new_keys.items():
        n += 1
        if quota is not None and n > quota:
            break
        ch_type = DYNAMIC_NEWKEY_CH_TYPE[itype]
        if prometheus_schema:
            if itype is not InternalType.STRING:
                continue
            target = f"{table}_series"
        else:
            target = table
        stmts.append(
            f"ALTER TABLE {db}.{target} {on_cluster} "
            f"ADD COLUMN IF NOT EXISTS `{key}` {ch_type}"
        )
    stmts.sort()
    return stmts


def recreate_dist_sql(
    cluster: str, db: str, table: str, dist_tables: list[str]
) -> list[str]:
    """DROP+CREATE pairs that rebuild each Distributed wrapper after the
    local table's schema changed (output/clickhouse_util.go:123-139) — a
    Distributed table snapshots the underlying schema at CREATE time, so
    it must be recreated to expose added columns."""
    stmts: list[str] = []
    for dist in dist_tables:
        stmts.append(f"DROP TABLE IF EXISTS {db}.{dist} ON CLUSTER {cluster}")
        stmts.append(
            f"CREATE TABLE {db}.{dist} ON CLUSTER {cluster} AS {table} "
            f"ENGINE = Distributed({cluster}, {db}, {table});"
        )
    return stmts
