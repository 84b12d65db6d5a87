"""Message parsing: raw Kafka ``value`` strings -> typed DataFrames.

Covers the reference's parser surface (SURVEY.md §2.1 P1-P6):

- JSON (fastjson/gjson semantics)  -> ``parse_json``
- CSV (RFC-4180, configurable sep) -> ``parse_csv``
- DateTime layout cascade          -> datetimes.py
- per-key type inference for dynamic schema -> ``infer_internal_type``

Design: ONE ``from_json``/``from_csv`` with an all-string schema (objects
and arrays surface as raw JSON text — matching the reference's
"string target gets raw JSON" rule), then the lenient coercion expressions
from coerce.py. Everything stays inside whole-stage codegen; there is no
Python in the hot path.

Dotted source names address nested JSON (gjson path syntax, reference
parser/gjson.go) and are extracted with ``get_json_object``. A literal dot
in a field name is escaped as ``\\.`` (reference util/common.go:98-101).

The bug-level-faithful Python reimplementation of the getter semantics
(used by the parity test-suite, not the hot path) lives in faithful.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .coerce import coerce_expr, kafka_virtual_source
from .schema import ColumnSpec, InternalType, TableSchema

_ARRAY_TYPES = {
    InternalType.INT_ARRAY,
    InternalType.FLOAT_ARRAY,
    InternalType.STRING_ARRAY,
    InternalType.DATETIME_ARRAY,
}


def _split_source_path(source: str) -> list[str]:
    """Split a dotted source path honoring ``\\.`` escapes."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(source):
        ch = source[i]
        if ch == "\\" and i + 1 < len(source) and source[i + 1] == ".":
            cur.append(".")
            i += 2
        elif ch == ".":
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    parts.append("".join(cur))
    return parts


def _raw_string_schema(specs: list[ColumnSpec]) -> T.StructType:
    """All-string extraction schema: arrays as array<string>, rest string."""
    fields: dict[str, T.DataType] = {}
    for spec in specs:
        # raw-path specs are single-part by construction (nested paths go
        # through get_json_object instead)
        src = _split_source_path(spec.source_name)[0]
        want = (
            T.ArrayType(T.StringType())
            if spec.internal in _ARRAY_TYPES
            else T.StringType()
        )
        prev = fields.get(src)
        if prev is not None and prev != want:
            # one source feeding both an array and a scalar target cannot
            # share a single raw extraction field — first-spec-wins would
            # silently mistype one of them; fail loudly instead
            raise ValueError(
                f"source {src!r} is consumed by both array and scalar raw "
                "targets; give the targets distinct source fields"
            )
        fields[src] = want
    return T.StructType(
        [T.StructField(name, tp, True) for name, tp in fields.items()]
    )


def _raw_value_expr(parsed: Column, value_col: Column, spec: ColumnSpec) -> Column:
    """Pick the raw (string-ish) value for one target column."""
    parts = _split_source_path(spec.source_name)
    if len(parts) == 1:
        return parsed.getField(parts[0])
    # nested path: re-extract from the original message text (gjson path).
    # Bracket segments must NOT be preceded by a dot — Spark's JsonPath
    # parser rejects "$.['a.b'].c" (silently NULLing every row) but
    # accepts "$['a.b'].c".
    path = "$" + "".join(
        f"['{p}']" if "." in p else f".{p}" for p in parts
    )
    raw = F.get_json_object(value_col, path)
    if spec.internal in _ARRAY_TYPES:
        return F.from_json(raw, T.ArrayType(T.StringType()))
    return raw


import re as _re

_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def parse_json(
    df: DataFrame,
    schema: TableSchema,
    value_col: str = "value",
    time_unit: float = 1.0,
    keep_value: bool = False,
) -> DataFrame:
    """Parse a JSON ``value`` column into the target table schema.

    Flat identifier-named fields go through the VariantType path
    (``coerce_variant_expr``): token-type-faithful fastjson semantics — a
    JSON *string* "7" is rejected for an Int target exactly like the
    reference's fastjson getters, because the variant preserves the token
    type.  Dotted/nested source names use ``get_json_object`` (gjson path
    semantics, which are string-lenient — matching the reference's gjson
    parser being the lenient one of the pair).

    Rows whose value is not valid JSON produce all-default rows in the
    reference only when *fields* are bad; a wholly unparseable message is
    dropped-but-acked (reference task/task.go:280-287). Use
    ``with_parse_errors`` to split those out.
    """
    from .coerce import coerce_variant_expr
    from .datetimes import _clean

    specs = list(schema)
    value = F.col(value_col)

    # Single-evaluation staging.  Every expensive expression that is
    # referenced more than once downstream — the two message parses, each
    # field's variant extraction, its schema_of_variant type tag, and the
    # cleaned datetime string — is hoisted into its OWN projection stage and
    # referenced as an attribute afterwards.  Catalyst's CollapseProject
    # never inlines a non-cheap producer referenced more than once, so the
    # stages survive optimization, each helper is computed exactly once per
    # row inside whole-stage codegen, and the per-branch CASE conditions
    # downstream compare precomputed attributes instead of re-running
    # schema_of_variant / trim+regexp chains per branch (the round-2 10×
    # ingest parse regression: O(layouts × branches) interpreted work/row).
    parsed = F.col("__sinker_praw")
    root = F.col("__sinker_vroot")

    _DT_TYPES = (InternalType.DATETIME, InternalType.ELASTIC_DATETIME)
    stage_extract: dict[str, Column] = {}   # fv / raw per target column
    stage_tag: dict[str, Column] = {}       # vt / datetime string per column
    stage_clean: dict[str, Column] = {}     # cleaned datetime string
    plans: list[tuple] = []  # (kind, spec, names...) in output order
    raw_path_specs: list[ColumnSpec] = []   # specs extracted from the raw parse

    for i, spec in enumerate(specs):
        ksrc = kafka_virtual_source(spec.name)
        if ksrc is not None and ksrc in df.columns:
            plans.append(("kafka", spec, ksrc))
            continue
        parts = _split_source_path(spec.source_name)
        if (
            len(parts) == 1
            and _IDENT_RE.match(parts[0])
            and spec.internal != InternalType.STRING
        ):
            # String targets take the raw-text path below instead: the
            # reference emits the value's raw JSON text verbatim, while
            # variant re-serialization normalizes it (sorts object keys,
            # drops ".0" from integral floats inside arrays).
            fv_name = f"__sinker_fv{i}"
            stage_extract[fv_name] = F.try_variant_get(
                root, f"$.{parts[0]}", "variant"
            )
            if spec.internal in _ARRAY_TYPES:
                # array elements are coerced inside a transform lambda; the
                # element variant is the lambda variable (bound once)
                plans.append(("variant_array", spec, fv_name))
                continue
            vt_name = f"__sinker_vt{i}"
            stage_tag[vt_name] = F.schema_of_variant(F.col(fv_name))
            if spec.internal in _DT_TYPES:
                s_name = f"__sinker_s{i}"
                cl_name = f"__sinker_cl{i}"
                stage_tag[s_name] = F.try_variant_get(F.col(fv_name), "$", "string")
                stage_clean[cl_name] = _clean(F.col(s_name))
                plans.append(("variant_dt", spec, fv_name, vt_name, s_name, cl_name))
            else:
                plans.append(("variant", spec, fv_name, vt_name))
            continue
        if len(parts) == 1:  # nested paths extract from the message text
            raw_path_specs.append(spec)
        raw_name = f"__sinker_raw{i}"
        stage_extract[raw_name] = _raw_value_expr(parsed, value, spec)
        if spec.internal in _DT_TYPES:
            cl_name = f"__sinker_cl{i}"
            stage_tag[cl_name] = _clean(F.col(raw_name).cast("string"))
            plans.append(("raw_dt", spec, raw_name, cl_name))
        else:
            plans.append(("raw", spec, raw_name))

    # Stage the message parses — each pruned to what the plan actually
    # uses.  The raw from_json schema lists ONLY the raw-path fields (a
    # String-heavy schema skips variant work per field; a numeric-heavy
    # schema materializes few raw fields), and a parse with no consumers
    # is omitted entirely, so a schema never pays for both full parses.
    parse_stage: dict[str, Column] = {}
    if raw_path_specs:
        parse_stage["__sinker_praw"] = F.from_json(
            value, _raw_string_schema(raw_path_specs)
        )
    if any(p[0] in ("variant", "variant_dt", "variant_array") for p in plans):
        parse_stage["__sinker_vroot"] = F.try_parse_json(value.cast("string"))
    staged = df.withColumns(parse_stage) if parse_stage else df

    if stage_extract:
        staged = staged.withColumns(stage_extract)
    if stage_tag:
        staged = staged.withColumns(stage_tag)
    if stage_clean:
        staged = staged.withColumns(stage_clean)

    out_cols: list[Column] = []
    for plan in plans:
        kind, spec = plan[0], plan[1]
        if kind == "kafka":
            out_cols.append(F.col(plan[2]).cast(spec.spark_type).alias(spec.name))
        elif kind == "variant_array":
            out_cols.append(coerce_variant_expr(F.col(plan[2]), spec, time_unit))
        elif kind == "variant":
            out_cols.append(
                coerce_variant_expr(
                    F.col(plan[2]), spec, time_unit, vt=F.col(plan[3])
                )
            )
        elif kind == "variant_dt":
            out_cols.append(
                coerce_variant_expr(
                    F.col(plan[2]),
                    spec,
                    time_unit,
                    vt=F.col(plan[3]),
                    dt_str=F.col(plan[4]),
                    dt_cleaned=F.col(plan[5]),
                )
            )
        elif kind == "raw_dt":
            out_cols.append(
                coerce_expr(
                    F.col(plan[2]),
                    spec,
                    time_unit,
                    raw_is_attr=True,
                    dt_cleaned=F.col(plan[3]),
                )
            )
        else:  # raw
            out_cols.append(
                coerce_expr(F.col(plan[2]), spec, time_unit, raw_is_attr=True)
            )
    if keep_value:
        out_cols.append(value.alias("__raw_value"))
    # output is exactly the dims (+ optional raw value): Kafka metadata
    # reaches the table only through explicit __kafka* virtual dims — a
    # silent topic/partition/offset passthrough broke JDBC inserts into
    # tables without those columns and disagreed with parse_csv
    return staged.select(*out_cols)


def with_parse_errors(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Add ``__parse_error`` true when the message is not a JSON object.

    Mirrors PR4: unparseable message -> excluded from the batch but still
    acked + counted (reference task/ring.go:196-200). Downstream:
    ``df.filter(~F.col('__parse_error'))`` and observe the error count.
    """
    probe = F.try_parse_json(F.col(value_col))
    # a valid-JSON scalar/array ('7', '[1,2]') is NOT an object row: the
    # reference's parser returns nil for it and the row is dropped-but-
    # acked, same as invalid JSON (faithful.parse_message parity)
    return df.withColumn(
        "__parse_error",
        probe.isNull()
        | ~F.schema_of_variant(probe).startswith("OBJECT"),
    )


def _csv_cell_norm(cell: Column) -> Column:
    """Reference cell semantics (parser/csv.go:68-112): a matched record's
    cell is always a STRING and only the literal ``"null"`` maps to nil.
    ``from_csv`` reports NULL for both EMPTY and (permissively padded)
    missing cells — normalize both to '' first, then map 'null' to NULL,
    so Nullable(String) keeps the reference's empty-cell-is-'' behavior
    (the r8 ingest fuzz caught Spark's empty-cell→NULL default here)."""
    filled = F.coalesce(cell, F.lit(""))
    return F.when(filled == "null", F.lit(None).cast("string")).otherwise(
        filled
    )


def parse_csv(
    df: DataFrame,
    schema: TableSchema,
    csv_format: list[str],
    delimiter: str = ",",
    value_col: str = "value",
    time_unit: float = 1.0,
) -> DataFrame:
    """Parse a CSV ``value`` column (one record per message).

    ``csv_format`` is the ordered column list of the CSV record (reference
    config ``csvFormat``); array-typed targets are embedded JSON strings
    inside the cell (reference parser/csv.go:41-230).

    Cell semantics follow the reference (parser/csv.go:68-112): a parsed
    record's cell is always a STRING — only the literal ``"null"`` maps to
    nil (→ NULL for nullable targets, the type default otherwise); an
    EMPTY cell is the empty string, so ``Nullable(String)`` keeps '' (the
    r8 ingest fuzz caught Spark's empty-cell→NULL default diverging here).
    Deliberate softenings vs the reference, documented rather than
    replicated: the reference ERRORS any record whose cell count mismatches
    ``csvFormat`` (we pad/ignore permissively — padded cells behave as
    empty), and its fastfloat best-effort numerics return 0 where the
    shared lenient matrix returns NULL→default (visible only on nullable
    numeric targets fed garbage, e.g. reference Nullable(Float64) of
    'abc' → 0.0, here NULL).
    """
    from .datetimes import _clean

    ddl = ", ".join(f"`{name}` STRING" for name in csv_format)
    # escape='"' gives RFC-4180 doubled-quote semantics (reference
    # parser/csv.go uses encoding/csv, which is RFC-4180)
    # Same single-evaluation staging as parse_json: the record parse, each
    # cell extraction, and the cleaned datetime string become attributes so
    # conditional branches downstream never re-instantiate them.
    parsed = F.col("__sinker_craw")
    staged = df.withColumns(
        {
            "__sinker_craw": F.from_csv(
                F.col(value_col),
                F.lit(ddl),
                {"sep": delimiter, "mode": "PERMISSIVE", "escape": '"'},
            )
        }
    )
    by_source = {s: i for i, s in enumerate(csv_format)}
    _DT_TYPES = (InternalType.DATETIME, InternalType.ELASTIC_DATETIME)
    stage_cells: dict[str, Column] = {}
    stage_clean: dict[str, Column] = {}
    plans: list[tuple] = []  # (kind, spec, names...)
    for i, spec in enumerate(schema):
        ksrc = kafka_virtual_source(spec.name)
        if ksrc is not None and ksrc in df.columns:
            plans.append(("kafka", spec, ksrc))
            continue
        if spec.source_name not in by_source:
            plans.append(("missing", spec))
            continue
        cell = _csv_cell_norm(parsed.getField(spec.source_name))
        raw_name = f"__sinker_c{i}"
        if spec.internal in _ARRAY_TYPES:
            stage_cells[raw_name] = F.from_json(cell, T.ArrayType(T.StringType()))
            plans.append(("array", spec, raw_name))
        elif spec.internal in _DT_TYPES:
            cl_name = f"__sinker_ccl{i}"
            stage_cells[raw_name] = cell
            stage_clean[cl_name] = _clean(F.col(raw_name))
            plans.append(("dt", spec, raw_name, cl_name))
        else:
            stage_cells[raw_name] = cell
            plans.append(("cell", spec, raw_name))
    if stage_cells:
        staged = staged.withColumns(stage_cells)
    if stage_clean:
        staged = staged.withColumns(stage_clean)

    out_cols = []
    for plan in plans:
        kind, spec = plan[0], plan[1]
        if kind == "kafka":
            out_cols.append(F.col(plan[2]).cast(spec.spark_type).alias(spec.name))
        elif kind == "missing":
            out_cols.append(coerce_expr(F.lit(None).cast("string"), spec, time_unit))
        elif kind == "array":
            # array cells coerce inside a transform lambda (bound once)
            out_cols.append(coerce_expr(F.col(plan[2]), spec, time_unit))
        elif kind == "dt":
            out_cols.append(
                coerce_expr(
                    F.col(plan[2]),
                    spec,
                    time_unit,
                    raw_is_attr=True,
                    dt_cleaned=F.col(plan[3]),
                )
            )
        else:
            out_cols.append(
                coerce_expr(F.col(plan[2]), spec, time_unit, raw_is_attr=True)
            )
    return staged.select(*out_cols)


# ---------------------------------------------------------------------------
# P6: per-key type inference (dynamic schema mode)
# ---------------------------------------------------------------------------

def infer_internal_type(value) -> InternalType:
    """Infer the internal type of one JSON value, with the reference's
    priority rules (reference parser/fastjson.go:302-340):

    bool -> Int; integral number -> Int; other number -> Float;
    string parseable as datetime -> DateTime else String;
    object -> String (serialized); array -> elem-type array (first
    non-null element decides; empty/all-null -> Unknown).
    """
    from .faithful import parse_datetime_python  # lazy: avoids cycle

    if value is None:
        return InternalType.UNKNOWN
    if isinstance(value, bool):
        return InternalType.INT
    if isinstance(value, int):
        return InternalType.INT
    if isinstance(value, float):
        return InternalType.INT if float(value).is_integer() else InternalType.FLOAT
    if isinstance(value, str):
        if parse_datetime_python(value) is not None:
            return InternalType.DATETIME
        return InternalType.STRING
    if isinstance(value, dict):
        return InternalType.STRING
    if isinstance(value, list):
        elem = next((v for v in value if v is not None), None)
        it = infer_internal_type(elem)
        return {
            InternalType.INT: InternalType.INT_ARRAY,
            InternalType.FLOAT: InternalType.FLOAT_ARRAY,
            InternalType.STRING: InternalType.STRING_ARRAY,
            InternalType.DATETIME: InternalType.DATETIME_ARRAY,
            InternalType.UNKNOWN: InternalType.UNKNOWN,
        }.get(it, InternalType.STRING_ARRAY)
    return InternalType.STRING
