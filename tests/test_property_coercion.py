"""Property-based coercion tests (hypothesis): the Spark expression layer
must agree with faithful.py (the bug-level-faithful Python reimplementation
of the reference's getters) on arbitrary JSON values.

The reference has no property tests (SURVEY §5); this is the upgrade: any
JSON value × any target type → identical results from two independent
implementations, or the coercion contract is broken.

Strategy: generate batches of random JSON messages driver-side, run BOTH
implementations, compare row-by-row.  Hypothesis manages the value space;
one Spark job per batch (not per example) keeps runtime sane.
"""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_sinker_nali_spark.faithful import coerce_value
from clickhouse_sinker_nali_spark.parsers import parse_json
from clickhouse_sinker_nali_spark.schema import ColumnSpec, TableSchema

# JSON scalar values the parser can meet, incl. hostile ones
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**70), max_value=2**70),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=30),
    st.sampled_from(
        ["2024-03-05 10:11:12", "2024-03-05", "05/03/2024 10:11:12", "1700000000",
         "not a date", "", "  7  ", "3.5", "-12", "true"]
    ),
)
json_values = st.one_of(
    scalars,
    st.lists(scalars, max_size=5),
    st.dictionaries(st.sampled_from(["a", "b"]), scalars, max_size=2),
)

# NOTE: one source field feeds either scalar OR array targets within a
# single parse (the permissive raw schema picks one physical representation
# per field), so the property runs as two passes.
SCALAR_TARGETS = [
    ("Int64", "i"),
    ("UInt8", "u8"),
    ("Nullable(Int64)", "ni"),
    ("Float64", "f"),
    ("Nullable(Float64)", "nf"),
    ("String", "s"),
    ("Nullable(String)", "ns"),
]
ARRAY_TARGETS = [
    ("Array(Int64)", "ai"),
    ("Array(Float64)", "af"),
    ("Array(String)", "as_"),
]


import re as _re

_UESC = _re.compile(r"\\u([0-9a-fA-F]{4})")


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return 0.0  # collapse -0.0 (variant decimals drop the sign)
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, str):
        # Serialized-JSON strings (object/array → String target) compare by
        # parsed VALUE, not text: Jackson and Python both emit
        # shortest-round-trip doubles but with different digit choices
        # (4.5671926166590716E46 vs 4.567192616659072e+46 — same double),
        # and faithful.py's json.dumps is itself only an approximation of
        # Go strconv formatting.  Value equality is the honest oracle.
        if v[:1] in "[{":
            try:
                return ("json", _canon(json.loads(v)))
            except (ValueError, RecursionError):
                pass
        # float-literal strings: Spark renders 1.0E16, python 1e+16 —
        # same double, cosmetic formatting
        if _re.fullmatch(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", v) and any(
            c in v for c in ".eE"
        ):
            try:
                f = float(v)
                return repr(0.0 if f == 0.0 else f)  # "-0.0" ≡ "0.0", see above
            except ValueError:
                pass
        # Spark serializes JSON \uXXXX escapes uppercase, python lowercase —
        # same code point, cosmetic difference
        return _UESC.sub(lambda m: "\\u" + m.group(1).lower(), v)
    return v


def _schema(targets):
    return TableSchema(
        columns=[
            ColumnSpec(name=alias, ch_type=ch, source_name="v")
            for ch, alias in targets
        ]
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(values=st.lists(json_values, min_size=1, max_size=25))
def test_spark_scalar_coercion_matches_faithful(spark, values):
    _check(spark, _schema(SCALAR_TARGETS), values)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(values=st.lists(st.lists(scalars, max_size=5), min_size=1, max_size=15))
def test_spark_array_coercion_matches_faithful(spark, values):
    _check(spark, _schema(ARRAY_TARGETS), values)


def _check(spark, schema, values):
    msgs = [json.dumps({"v": v}) for v in values]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    rows = parse_json(df, schema).collect()
    assert len(rows) == len(values)
    for msg, row in zip(msgs, rows):
        obj = json.loads(msg)
        for spec in schema:
            expected = coerce_value(obj.get("v"), spec)
            alias, ch_type = spec.name, spec.ch_type
            got = row[alias]
            # timestamps out of scope here (covered by golden tables);
            # everything else must match exactly
            assert _canon(got) == _canon(expected), (
                f"value={obj['v']!r} target={ch_type}: spark={got!r} "
                f"faithful={expected!r}"
            )


# -- connected components vs. union-find reference --------------------------


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    n_edges = draw(st.integers(min_value=0, max_value=40))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(n_edges)
    ]
    return n, edges


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id of the component
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n)}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(graphs())
def test_connected_components_matches_union_find(spark, g):
    from clickhouse_sinker_nali_spark.operators.dedup import connected_components

    n, edges = g
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id: bigint")
    edf = (
        spark.createDataFrame(edges, "src: bigint, dst: bigint")
        if edges
        else spark.createDataFrame([], "src: bigint, dst: bigint")
    )
    got = {r.id: r.component for r in connected_components(nodes, edf).collect()}
    assert got == _union_find(n, edges)


# ---------------------------------------------------------------------------
# normalize_text properties

# strings with controls, unicode, and whitespace runs mixed in
_norm_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0, max_codepoint=0x2FF),
        st.sampled_from(" \t\n\r\x00\x7f\x85\xa0"),
    ),
    max_size=60,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_norm_text, min_size=1, max_size=40))
def test_normalize_text_idempotent_and_clean(spark, texts):
    """For arbitrary input: the normalized form contains no control chars
    and no whitespace runs, and normalizing it again is a fixpoint.
    One Spark job per hypothesis batch."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from clickhouse_sinker_nali_spark.operators import text as T

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp(prefix="normprop_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = T.normalize_text(spark, d)
    # round-trip: write the normalized corpus back as documents and re-normalize
    out.select(
        F.col("doc_id"), F.col("norm_text").alias("text"),
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.col("norm_chars").cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(d, "2", "documents.parquet"))
    again = {r.doc_id: r.norm_text
             for r in T.normalize_text(spark, os.path.join(d, "2")).collect()}
    for r in out.collect():
        nt = r.norm_text
        assert nt == nt.strip()
        assert "  " not in nt
        assert not any(ord(c) < 0x20 or 0x7F <= ord(c) <= 0x9F for c in nt)
        assert again[r.doc_id] == nt, "normalize_text is not idempotent"


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\x00"
            ),
            min_size=0,
            max_size=64,
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_portable_hash64_parity_spark_duckdb(spark, strings):
    """The 60-bit portable hash — the foundation under every dedup /
    shard / sampling / shuffle gate — must agree bit-for-bit between
    Spark and DuckDB on arbitrary unicode strings."""
    import duckdb

    from pyspark.sql import functions as F

    from clickhouse_sinker_nali_spark.functions import portable_hash64

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", portable_hash64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    for s in strings:
        (h,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()
        assert got[s] == h, f"hash divergence on {s!r}"
