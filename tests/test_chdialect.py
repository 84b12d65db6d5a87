"""Byte-for-byte golden tests of the ClickHouse dialect layer.

Every expected string below is hand-derived from the reference's format
strings (output/clickhouse.go, output/clickhouse_util.go, pool/conn.go) —
the statements a live ClickHouse server has been accepting from the
reference daemon; quirks (double spaces, trailing semicolons, escaped
regex quotes) are part of the contract.
"""

from __future__ import annotations

import pytest

from clickhouse_sinker_nali_spark.schema import InternalType
from clickhouse_sinker_nali_spark.streaming.chdialect import (
    CHServerError,
    MAX_BUFFER_SIZE,
    REPLICA_SPECIFIC_ERROR_CODES,
    alter_sql,
    dist_tables_sql,
    dsn_suffix,
    insert_sql,
    recreate_dist_sql,
    replica_dsn,
    select_columns_sql,
    series_insert_sql,
    series_preload_sql,
    should_reconnect,
)
from clickhouse_sinker_nali_spark.streaming.sinks import with_retries


# -- INSERT (output/clickhouse.go:341-354) ---------------------------------

def test_insert_sql_golden():
    # reference: "INSERT INTO " + DB + "." + table + " (`a`,`b`) VALUES (?,?)"
    assert (
        insert_sql("default", "test_fixed_schema", ["time", "name", "value", "price"])
        == "INSERT INTO default.test_fixed_schema (`time`,`name`,`value`,`price`)"
        " VALUES (?,?,?,?)"
    )


def test_series_insert_sql_golden():
    # prometheus series table: dims lead with __series_id, labels
    # (output/clickhouse.go:289-300)
    assert (
        series_insert_sql("default", "prom_metric", ["__series_id", "labels", "job"])
        == "INSERT INTO default.prom_metric_series (`__series_id`,`labels`,`job`)"
        " VALUES (?,?,?)"
    )


# -- catalog probes --------------------------------------------------------

def test_select_columns_sql_golden():
    # selectSQLTemplate, output/clickhouse.go:42 — lowercase keywords
    assert (
        select_columns_sql("default", "t1")
        == "select name, type, default_kind from system.columns"
        " where database = 'default' and table = 't1'"
    )


def test_series_preload_sql_golden():
    # output/clickhouse.go:201
    assert (
        series_preload_sql("default", "prom_metric")
        == "SELECT __series_id FROM default.prom_metric_series"
    )


def test_series_preload_sql_dist_golden():
    # cluster mode reads through the first Distributed wrapper,
    # output/clickhouse.go:199
    assert (
        series_preload_sql("default", "prom_metric", dist_table="dist_prom_metric_series")
        == "SELECT __series_id FROM default.dist_prom_metric_series"
    )


def test_dist_tables_sql_golden():
    # output/clickhouse.go:470-471: raw Go literal keeps the backslashes,
    # so the server receives \( \' ... literally
    assert dist_tables_sql("default", "abc", "t1") == (
        "SELECT name FROM system.tables WHERE engine='Distributed' AND "
        "database='default' AND match(create_table_query, "
        "'Distributed\\(\\'abc\\', \\'default\\', \\'t1\\'\\)')"
    )


# -- schema evolution DDL (output/clickhouse.go:369-460) -------------------

def test_alter_sql_on_cluster_sorted():
    stmts = alter_sql(
        "default",
        "t_dyn",
        {
            "newkey02": InternalType.FLOAT,
            "newkey01": InternalType.INT,
            "newkey03": InternalType.STRING,
            "newkey04": InternalType.DATETIME,
            "newkey06": InternalType.INT_ARRAY,
            "newkey07": InternalType.FLOAT_ARRAY,
            "newkey08": InternalType.STRING_ARRAY,
            "newkey09": InternalType.DATETIME_ARRAY,
        },
        cluster="abc",
    )
    # sort.Strings ordering + the exact newkey->CH type table
    # (output/clickhouse.go:396-416)
    assert stmts == [
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey01` Nullable(Int64)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey02` Nullable(Float64)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey03` Nullable(String)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey04` Nullable(DateTime64(3))",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey06` Array(Int64)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey07` Array(Float64)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey08` Array(String)",
        "ALTER TABLE default.t_dyn ON CLUSTER abc ADD COLUMN IF NOT EXISTS `newkey09` Array(DateTime64(3))",
    ]


def test_alter_sql_no_cluster_double_space():
    # Go formats the empty onCluster through %s → double space; the server
    # has always received it that way, so we emit it identically
    stmts = alter_sql("db1", "tbl", {"k": InternalType.INT})
    assert stmts == [
        "ALTER TABLE db1.tbl  ADD COLUMN IF NOT EXISTS `k` Nullable(Int64)"
    ]


def test_alter_sql_prometheus_strings_only_target_series():
    # prometheus mode: only String keys alter, against <table>_series
    # (output/clickhouse.go:420-427)
    stmts = alter_sql(
        "default",
        "prom_metric",
        {"job": InternalType.STRING, "val2": InternalType.FLOAT},
        cluster="abc",
        prometheus_schema=True,
    )
    assert stmts == [
        "ALTER TABLE default.prom_metric_series ON CLUSTER abc"
        " ADD COLUMN IF NOT EXISTS `job` Nullable(String)"
    ]


def test_alter_sql_prometheus_quota_burns_on_skipped_keys():
    # faithful reference quirk: i++ precedes the String filter
    # (output/clickhouse.go:389-405), so a non-String key consumes quota
    # even though it can never emit an ALTER in prometheus mode
    stmts = alter_sql(
        "d", "t",
        {"val2": InternalType.FLOAT, "job": InternalType.STRING},
        prometheus_schema=True, max_dims=11, n_current_dims=10,
    )
    assert stmts == []  # FLOAT burned the only slot; reference does the same


def test_alter_sql_maxdims_quota():
    # maxDims caps admitted keys at max_dims - current (task quota check,
    # output/clickhouse.go:377-392)
    keys = {f"k{i}": InternalType.INT for i in range(5)}
    assert len(alter_sql("d", "t", keys, max_dims=12, n_current_dims=10)) == 2
    assert alter_sql("d", "t", keys, max_dims=10, n_current_dims=10) == []
    # no cap configured -> all keys admitted
    assert len(alter_sql("d", "t", keys)) == 5


def test_recreate_dist_sql_golden():
    # DROP (no semicolon) + CREATE ... AS <local> ENGINE = Distributed(...);
    # exact arg order cluster, db, table (output/clickhouse_util.go:123-139)
    stmts = recreate_dist_sql("abc", "default", "t1", ["dist_t1", "dist_t1_b"])
    assert stmts == [
        "DROP TABLE IF EXISTS default.dist_t1 ON CLUSTER abc",
        "CREATE TABLE default.dist_t1 ON CLUSTER abc AS t1 ENGINE = Distributed(abc, default, t1);",
        "DROP TABLE IF EXISTS default.dist_t1_b ON CLUSTER abc",
        "CREATE TABLE default.dist_t1_b ON CLUSTER abc AS t1 ENGINE = Distributed(abc, default, t1);",
    ]


# -- DSN (pool/conn.go:128-162) --------------------------------------------

def test_dsn_suffix_golden():
    # block_size = 2*MaxBufferSize = 2097152 (config/config.go:165)
    assert MAX_BUFFER_SIZE == 1 << 20
    assert (
        dsn_suffix("default", "user1", "p@ss w")
        == "?database=default&username=user1&password=p%40ss+w&block_size=2097152"
    )


def test_dsn_suffix_params_and_secure():
    s = dsn_suffix(
        "db", "u", "p", dsn_params="read_timeout=300", secure=True, skip_verify=True
    )
    assert s == (
        "?database=db&username=u&password=p&block_size=2097152"
        "&read_timeout=300&secure=true&skip_verify=true"
    )


def test_replica_dsn_golden():
    assert (
        replica_dsn("127.0.0.1:9000", dsn_suffix("default", "u", ""))
        == "tcp://127.0.0.1:9000?database=default&username=u&password="
        "&block_size=2097152"
    )


# -- shouldReconnect decision table (output/clickhouse_util.go:16-30) -------

@pytest.mark.parametrize(
    "err,expected",
    [
        # replica-specific server codes -> rotate
        (CHServerError(242, "TABLE_IS_READ_ONLY"), True),
        (CHServerError(319, "UNKNOWN_STATUS_OF_INSERT"), True),
        (CHServerError(1000, "POCO_EXCEPTION"), True),
        # any other server code fails identically everywhere -> don't rotate
        (CHServerError(62, "SYNTAX_ERROR"), False),
        (CHServerError(241, "MEMORY_LIMIT_EXCEEDED"), False),
        (CHServerError(53, "TYPE_MISMATCH"), False),
        # non-server errors: connection is suspect -> rotate
        (ConnectionResetError("peer reset"), True),
        (TimeoutError("read timeout"), True),
        # JDBC/py4j-wrapped server errors carry the code in the message
        (RuntimeError("SQLException: Code: 242. DB::Exception: Table is in readonly mode"), True),
        (RuntimeError("SQLException: Code: 60. DB::Exception: Table default.x does not exist"), False),
        (RuntimeError("Connection refused (Connection refused)"), True),
        # a bare "Code: NNN" from a NON-ClickHouse layer (HTTP proxy text,
        # nested driver codes) must not be mistaken for a server error —
        # the connection is suspect, so rotate
        (RuntimeError("HTTP 502 Bad Gateway: upstream Code: 60 from proxy"), True),
        (RuntimeError("driver internal Code: 53 (handshake)"), True),
        # anchored shape still matches when wrapped deeper in the message
        (RuntimeError("py4j.protocol.Py4JJavaError: ... Code: 319. DB::Exception: Unknown status"), True),
        # legacy (pre-21.x / ru.yandex JDBC) server format: comma +
        # e.displayText() — still a server error, classified by code
        (RuntimeError("Code: 62, e.displayText() = DB::Exception: Syntax error"), False),
        (RuntimeError("Code: 242, e.displayText() = DB::Exception: Table is in readonly mode"), True),
    ],
)
def test_should_reconnect_table(err, expected):
    assert should_reconnect(err) is expected


def test_error_code_set_matches_reference():
    # output/clickhouse.go:48
    assert REPLICA_SPECIFIC_ERROR_CODES == {242, 319, 1000}


# -- with_retries integration ----------------------------------------------

def test_with_retries_fails_fast_on_non_replica_error():
    calls = []

    def fn(r):
        calls.append(r)
        raise CHServerError(62, "syntax error")

    with pytest.raises(CHServerError):
        with_retries(fn, replicas=3, retry_times=3, sleep=lambda s: None,
                     should_rotate=should_reconnect)
    assert calls == [0]  # no rotation burned on a deterministic failure


def test_with_retries_rotates_on_replica_specific_error():
    calls = []

    def fn(r):
        calls.append(r)
        if len(calls) < 3:
            raise CHServerError(242, "read only")

    winner = with_retries(fn, replicas=3, retry_times=3, sleep=lambda s: None,
                          should_rotate=should_reconnect)
    assert calls == [0, 1, 2]
    assert winner == 2
