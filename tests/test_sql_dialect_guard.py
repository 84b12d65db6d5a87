"""Structural guards against regex-dialect drift in the SQL oracles.

Two dialect rules were established after real divergences (rounds 4):

1. No ``\\s`` in any SQL oracle string — RE2's ``\\s`` excludes vertical
   tab while Java's includes it, so every split/match must use the
   explicit ASCII class ``[ \\t\\n\\x0b\\f\\r]`` byte-identically.
2. No ``\\uXXXX`` escapes in SQL regexes — RE2 rejects them and DuckDB's
   regexp_replace silently no-ops the whole pattern; ``\\x{XXXX}`` parses
   in both engines.

These greps run over the package source so the NEXT copy-pasted oracle
fails CI instead of silently diverging.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "clickhouse_sinker_nali_spark",
)

WS_CLASS = "[ \\t\\n\\x0b\\f\\r]"  # the canonical source literal


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_no_backslash_s_in_sql_strings():
    # SQL-side patterns appear in source as a double backslash (``\\s``);
    # Spark-side Java patterns use raw strings (single backslash), which
    # are fine — Java \s IS the explicit class.
    offenders = []
    for path in _py_files():
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if "\\\\s" in line and "noqa: ws-dialect" not in line:
                offenders.append(f"{path}:{i}: {line.strip()[:100]}")
    assert not offenders, (
        "SQL oracle strings must use the explicit whitespace class "
        f"{WS_CLASS!r}, not \\s (RE2/Java divergence):\n" + "\n".join(offenders)
    )


def test_no_u_escapes_in_sql_regexes():
    # \uXXXX parses in Java but is an RE2 error that DuckDB swallows,
    # silently no-opping the pattern — use \x{XXXX} in shared regexes.
    offenders = []
    for path in _py_files():
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"""['"].*\\\\u[0-9a-fA-F]{4}""", line):
                offenders.append(f"{path}:{i}: {line.strip()[:100]}")
    assert not offenders, (
        "regex escapes shared with DuckDB must use \\x{XXXX}, not \\uXXXX "
        "(RE2 rejects it and DuckDB no-ops the pattern):\n"
        + "\n".join(offenders)
    )


def test_ws_class_literals_are_identical():
    # every explicit whitespace class must START with the canonical ASCII
    # run (a reordered or partial copy would diverge silently); extending
    # it with Unicode members (normalize_text's \p{Zs} class) is fine
    canon = "[ \\\\t\\\\n\\\\x0b\\\\f\\\\r"
    bad = []
    for path in _py_files():
        src = open(path).read()
        for m in re.finditer(r"\[ ?\\\\t[^\]]*\]", src):
            if not m.group(0).startswith(canon):
                bad.append(f"{path}: {m.group(0)!r}")
    assert not bad, "non-canonical whitespace class literals:\n" + "\n".join(bad)


def test_ch_wire_sql_emitted_only_by_chdialect():
    """Every ClickHouse-dialect SQL string in the sink/ingest path must
    come from the byte-golden ``streaming/chdialect.py`` — a hand-rolled
    copy elsewhere WILL drift from the reference's emitted quirks (the
    r5 example: dynamic.py's own ALTER used backticked `db`.`tbl` where
    the reference emits bare db.tbl with a double space).  Markers chosen
    to be CH-wire-specific so ANSI/Derby DDL and Spark SQL stay free."""
    markers = [
        "ADD COLUMN IF NOT EXISTS `",   # CH ALTER column quoting
        "ENGINE = Distributed(",        # Distributed wrapper DDL
        "system.columns",               # catalog probe
        "__series_id FROM",             # series preload probe
        "block_size=",                  # DSN batching param
    ]
    offenders = []
    for path in _py_files():
        if path.endswith(os.path.join("streaming", "chdialect.py")):
            continue
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            if "``" in line:
                continue  # reST literal markup = docstring prose, not SQL
            # any marker on a remaining source line is a violation — an
            # f-string filter here once made the condition effectively
            # "is an f-string OR contains INSERT" (precedence bug), letting
            # plain-literal CH SQL escape the guard
            if any(m in line for m in markers):
                offenders.append(f"{path}:{i}: {stripped[:100]}")
    assert not offenders, (
        "CH wire SQL must be emitted via streaming/chdialect.py only:\n"
        + "\n".join(offenders)
    )
