"""Bug-level-faithful reimplementation of the reference's JSON getters.

The native path (parsers.py) keeps everything JVM-side and is the hot path.
This module replicates the reference's *exact* per-value getter semantics
(reference parser/fastjson.go:39-340, parser/parser.go:139-207) in pure
Python for (a) the parity test-suite and (b) an optional ``mapInPandas``
parse mode when bug-compatibility matters more than throughput.

Key quirks preserved (SURVEY.md §1.2):
- JSON string "123" for an Int target -> default 0 (fastjson Int64() only
  accepts number tokens), unlike the lenient native path which accepts it.
- float-valued number for Int target -> default (no truncation).
- bool for Int target -> 1/0; bool for Float target -> default.
- String target on non-string value -> raw JSON serialization.
- DateTime from number -> epoch secs * time_unit clamped to [0, 2^32) else
  Epoch; from string -> first matching layout, converted to UTC.
"""

from __future__ import annotations

import json
import math
import re
from datetime import datetime, timedelta, timezone
from typing import Any

from .schema import INT_BORDERS, ColumnSpec, InternalType

EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)
MAX_UNIX = float(2**32)
ZERO_UUID = "00000000-0000-0000-0000-000000000000"

# Zone-abbreviation offsets for Go layouts that carry zone names; Go resolves
# these against the local tz database — we pin the common unambiguous ones.
_TZ_ABBREV = {
    "UTC": 0, "GMT": 0, "UT": 0, "Z": 0,
    "EST": -5, "EDT": -4, "CST": -6, "CDT": -5,
    "MST": -7, "MDT": -6, "PST": -8, "PDT": -7,
}

_STRPTIME_LAYOUTS = (
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%d/%m/%Y %H:%M:%S",
    "%d/%m/%Y",
    "%b %d %H:%M:%S %Y",        # ANSIC (day-name stripped)
    "%d %b %y %H:%M %z",        # RFC822Z
    "%d %b %yy %H:%M:%S %z",
    "%d-%b-%y %H:%M:%S %z",     # RFC850
    "%d %b %Y %H:%M:%S %z",     # RFC1123Z
    "%b %d %H:%M:%S %z %Y",     # RubyDate
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
)

_DAYNAME_RE = re.compile(
    r"^(Mon|Tue(s)?|Wed(nes)?|Thu(rs)?|Fri|Sat(ur)?|Sun)(day)?,?\s+"
)
_WS_RE = re.compile(r"\s+")
_TZ_NAME_RE = re.compile(r"\b([A-Z]{2,4})\b")


def parse_datetime_python(s: str) -> datetime | None:
    """Layout-cascade parse of a datetime string; result is UTC-aware."""
    if not isinstance(s, str) or not s:
        return None
    txt = _WS_RE.sub(" ", _DAYNAME_RE.sub("", s.strip()))
    # 1) ISO-8601 / RFC3339 / ClickHouse styles
    try:
        dt = datetime.fromisoformat(txt.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    except ValueError:
        pass
    # 2) zone-name forms: substitute the named zone with a numeric offset
    candidates = [txt]
    m = _TZ_NAME_RE.search(txt)
    if m and m.group(1) in _TZ_ABBREV:
        off = _TZ_ABBREV[m.group(1)]
        candidates.append(
            txt.replace(m.group(1), f"{'+' if off >= 0 else '-'}{abs(off):02d}00")
        )
    for cand in candidates:
        for layout in _STRPTIME_LAYOUTS:
            try:
                dt = datetime.strptime(cand, layout)
            except ValueError:
                continue
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return dt.astimezone(timezone.utc)
    return None


def _epoch_to_dt(num: float, time_unit: float) -> datetime:
    secs = float(num) * time_unit
    if 0.0 <= secs < MAX_UNIX:
        return EPOCH_DT + timedelta(seconds=secs)
    return EPOCH_DT


def _default(spec_internal: InternalType, base_type: str, nullable: bool):
    if nullable:
        return None
    if spec_internal == InternalType.INT or spec_internal == InternalType.ELASTIC_DATETIME:
        return 0
    if spec_internal in (InternalType.FLOAT, InternalType.DECIMAL):
        return 0.0
    if spec_internal == InternalType.STRING:
        return ZERO_UUID if base_type == "UUID" else ""
    if spec_internal == InternalType.DATETIME:
        return EPOCH_DT
    return []  # arrays


def _clamp(v: int, base_type: str) -> int:
    borders = INT_BORDERS.get(base_type)
    if borders is None:
        borders = INT_BORDERS["Int64"]
    lo, hi = borders
    return lo if v < lo else hi if v > hi else v


def _get_int(value: Any, base_type: str):
    if isinstance(value, bool):
        return 1 if value else 0
    if isinstance(value, int):
        return _clamp(value, base_type)
    return None  # floats, strings, others -> default


def _get_float(value: Any):
    if isinstance(value, bool):
        return None  # fastjson Float64() rejects bool tokens
    if isinstance(value, (int, float)):
        f = float(value)
        return None if math.isnan(f) else f
    return None


def _get_string(value: Any):
    if isinstance(value, str):
        return value
    if value is None:
        return None
    # raw JSON text of the value (reference parser/fastjson.go:63-69)
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def _get_datetime(value: Any, time_unit: float):
    if isinstance(value, bool):
        return None
    if isinstance(value, (int, float)):
        return _epoch_to_dt(value, time_unit)
    if isinstance(value, str):
        return parse_datetime_python(value)
    return None


_ELEM_GETTER = {
    InternalType.INT_ARRAY: lambda v, tu: _get_int(v, "Int64"),
    InternalType.FLOAT_ARRAY: lambda v, tu: _get_float(v),
    InternalType.STRING_ARRAY: lambda v, tu: _get_string(v),
    InternalType.DATETIME_ARRAY: lambda v, tu: _get_datetime(v, tu),
}

_ELEM_DEFAULT = {
    InternalType.INT_ARRAY: 0,
    InternalType.FLOAT_ARRAY: 0.0,
    InternalType.STRING_ARRAY: "",
    InternalType.DATETIME_ARRAY: EPOCH_DT,
}


def coerce_value(value: Any, spec: ColumnSpec, time_unit: float = 1.0):
    """One JSON value -> typed python value with full reference semantics."""
    it = spec.internal
    if it in _ELEM_GETTER:
        if not isinstance(value, list):
            return _default(it, spec.base_type, spec.nullable)
        getter, edef = _ELEM_GETTER[it], _ELEM_DEFAULT[it]
        out = []
        for elem in value:
            got = getter(elem, time_unit)
            out.append(edef if got is None else got)
        return out

    if it == InternalType.INT:
        got = _get_int(value, spec.base_type)
    elif it in (InternalType.FLOAT, InternalType.DECIMAL):
        got = _get_float(value)
    elif it == InternalType.STRING:
        got = _get_string(value)
    elif it == InternalType.DATETIME:
        got = _get_datetime(value, time_unit)
    elif it == InternalType.ELASTIC_DATETIME:
        dt = _get_datetime(value, time_unit)
        got = None if dt is None else int(dt.timestamp())
    else:
        got = None
    if got is None:
        return _default(it, spec.base_type, spec.nullable)
    return got


def parse_message(raw: bytes | str, specs: list[ColumnSpec], time_unit: float = 1.0):
    """Parse one JSON message into a row list; None if wholly unparseable
    (dropped-but-acked, reference task/task.go:280-287)."""
    try:
        obj = json.loads(raw)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    return [coerce_value(obj.get(s.source_name), s, time_unit) for s in specs]
