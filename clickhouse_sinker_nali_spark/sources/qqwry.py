"""qqwry.dat (纯真 IP 库) binary reader → parquet interval-table converter.

The reference resolves IPs by binary-searching the qqwry binary at query
time, one lookup per row with a memoized cache
(``ipHandle/pkg/qqwry/qqwry.go:63-149``, helpers in
``ipHandle/pkg/common/struct.go``).  The Spark-first design inverts that:
walk the whole database ONCE offline, decode every range, and write a
sorted parquet interval table — the per-row "lookup" then becomes the
broadcast range join in :func:`clickhouse_sinker_nali_spark.enrich.enrich_ips`,
which stays JVM-side and costs no per-row Python at 100 TB.

Binary layout (public CZ88 format, as read by the reference):

- header: 8 bytes — ``first_index`` (LE u32), ``last_index`` (LE u32)
- index:  7-byte records — ``start_ip`` (LE u32) + ``record_offset`` (u24 LE)
- record: ``end_ip`` (LE u32, inclusive) then country/area data:
    - mode 0x01 at record+4: u24 → country block (which may itself start
      with 0x02 + u24 → country string, area at block+4; else an inline
      C-string, area follows it)
    - mode 0x02 at record+4: u24 → country string, area at record+8
    - otherwise: inline country C-string at record+4, area follows
- area: may itself be a 0x01/0x02 redirect (u24 ptr; 0 ⇒ empty)
- strings: NUL-terminated GBK; the literal filler " CZ88.NET" means
  "no data" and is stripped (reference ``qqwry.go:105-112`` — the F3
  GBK-decode step of SURVEY.md §2).

The decoded ``(country, area)`` map onto the enrichment columns
``(loc, isp)``.  Emitted ``ip_end`` is EXCLUSIVE (qqwry's inclusive end
+ 1) to match ``enrich_ips``'s ``ip >= ip_start AND ip < ip_end`` probe.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

CZ88_FILLER = " CZ88.NET"
_REDIRECT_MODES = (1, 2)


def _u32(data: bytes, off: int) -> int:
    return struct.unpack_from("<I", data, off)[0]


def _u24(data: bytes, off: int) -> int:
    return data[off] | (data[off + 1] << 8) | (data[off + 2] << 16)


def _cstr(data: bytes, off: int) -> tuple[bytes, int]:
    """NUL-terminated byte string at off → (bytes, offset past the NUL)."""
    end = data.index(0, off)
    return data[off:end], end + 1


def _read_area(data: bytes, off: int) -> bytes:
    mode = data[off]
    if mode in _REDIRECT_MODES:
        ptr = _u24(data, off + 1)
        if ptr == 0:
            return b""
        return _cstr(data, ptr)[0]
    return _cstr(data, off)[0]


def _decode(raw: bytes) -> str:
    return raw.decode("gbk", errors="replace").replace(CZ88_FILLER, "").strip()


def iter_qqwry(data: bytes) -> Iterator[tuple[int, int, str, str]]:
    """Yield every (ip_start, ip_end_inclusive, country, area) range.

    A linear walk over the sorted index — the offline converter reads each
    record exactly once, vs the reference's per-query binary search.
    """
    first, last = _u32(data, 0), _u32(data, 4)
    for idx in range(first, last + 7, 7):
        ip_start = _u32(data, idx)
        rec = _u24(data, idx + 4)
        ip_end = _u32(data, rec)
        mode = data[rec + 4]
        if mode == 1:
            block = _u24(data, rec + 5)
            if data[block] == 2:
                country = _cstr(data, _u24(data, block + 1))[0]
                area_off = block + 4
            else:
                country, area_off = _cstr(data, block)
        elif mode == 2:
            country = _cstr(data, _u24(data, rec + 5))[0]
            area_off = rec + 8
        else:
            country, area_off = _cstr(data, rec + 4)
        area = _read_area(data, area_off)
        yield ip_start, ip_end, _decode(country), _decode(area)


def qqwry_to_dataframe(spark: SparkSession, dat_path: str) -> DataFrame:
    """Parse a qqwry.dat file into the (ip_start, ip_end, loc, isp) shape
    consumed by ``enrich_ips`` (ip_end exclusive), sorted by ip_start.

    The whole DB is ~10 MB / ~700k ranges — driver-side parse is a one-time
    offline step, and the result broadcasts to every executor.
    """
    with open(dat_path, "rb") as f:
        data = f.read()
    rows = [
        (start, end + 1, loc, isp) for start, end, loc, isp in iter_qqwry(data)
    ]
    rows.sort(key=lambda r: r[0])
    return spark.createDataFrame(
        rows, "ip_start bigint, ip_end bigint, loc string, isp string"
    )


def qqwry_to_parquet(spark: SparkSession, dat_path: str, out_path: str) -> None:
    """One-time conversion: qqwry.dat → sorted single-file parquet ranges.

    ``load_qqwry_ranges`` (enrich.py) reads this output; re-running the
    conversion after a geo-DB refresh atomically replaces the table.
    """
    qqwry_to_dataframe(spark, dat_path).coalesce(1).write.mode("overwrite").parquet(
        out_path
    )


# --------------------------------------------------------------------------
# Fixture builder (tests): synthesize a structurally-valid qqwry blob.
# --------------------------------------------------------------------------


def build_qqwry_blob(
    entries: list[tuple[int, int, str, str]], styles: list[str] | None = None
) -> bytes:
    """Build a tiny in-memory qqwry.dat exercising every record layout.

    ``entries`` are (ip_start, ip_end_inclusive, country, area) with GBK-
    encodable strings; ``styles`` picks the per-record encoding:
    ``direct`` (inline strings), ``mode2`` (redirected country), or
    ``mode1`` (whole-block redirect, area itself mode-2-redirected).
    Appends the " CZ88.NET" filler to exercise the strip rule.
    """
    styles = styles or ["direct", "mode1", "mode2", "mode1_2"]
    body = bytearray(b"\x00" * 8)  # header placeholder
    pool: dict[bytes, int] = {}

    def intern(s: str) -> int:
        raw = s.encode("gbk") + b"\x00"
        if raw not in pool:
            pool[raw] = len(body)
            body.extend(raw)
        return pool[raw]

    def u24(v: int) -> bytes:
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    records: list[tuple[int, int]] = []  # (ip_start, record_offset)
    for i, (start, end, country, area) in enumerate(entries):
        style = styles[i % len(styles)]
        if style == "direct":
            # [end][country + filler\0][area\0] inline (filler strip rule)
            rec = len(body)
            body.extend(struct.pack("<I", end))
            body.extend((country + CZ88_FILLER).encode("gbk") + b"\x00")
            body.extend(area.encode("gbk") + b"\x00")
        elif style == "mode2":
            # [end][0x02][u24 → country string][area\0]
            cptr = intern(country)
            rec = len(body)
            body.extend(struct.pack("<I", end))
            body.append(2)
            body.extend(u24(cptr))
            body.extend(area.encode("gbk") + b"\x00")
        elif style == "mode1_2":
            # [end][0x01][u24 → block]; block = [0x02][u24 → country][area\0]
            cptr = intern(country)
            block = len(body)
            body.append(2)
            body.extend(u24(cptr))
            body.extend(area.encode("gbk") + b"\x00")
            rec = len(body)
            body.extend(struct.pack("<I", end))
            body.append(1)
            body.extend(u24(block))
        else:  # mode1: [end][0x01][u24 → block]; block = [country\0][0x01][u24 → area]
            aptr = intern(area)
            block = len(body)
            body.extend(country.encode("gbk") + b"\x00")
            body.append(1)
            body.extend(u24(aptr))
            rec = len(body)
            body.extend(struct.pack("<I", end))
            body.append(1)
            body.extend(u24(block))
        records.append((start, rec))

    records.sort(key=lambda r: r[0])
    first_index = len(body)
    for start, rec in records:
        body.extend(struct.pack("<I", start))
        body.extend(u24(rec))
    last_index = first_index + 7 * (len(records) - 1)
    struct.pack_into("<II", body, 0, first_index, last_index)
    return bytes(body)
