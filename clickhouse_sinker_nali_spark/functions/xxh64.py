"""XXH64 — byte-parity hashing for the reference's ``faithful`` mode.

The reference computes series ids and hash-shard assignments with xxhash64,
seed 0, over UTF-8 bytes (Go ``cespare/xxhash``: reference
``model/message.go:174-209`` builds the series digest from ``###name###value``
label pairs; ``task/sharding.go:91-98`` is ``xxhash.Sum64String(v) % ckNum``).
The engine's DEFAULT hash stays ``portable_hash64`` (md5-based) because the
DuckDB correctness oracle can reproduce it; this module exists for
migration/coexistence with a live reference deployment, where series ids and
shard routing must match the Go binary bit-for-bit.

Implementation is from the public XXH64 specification (Yann Collet,
xxhash.com — the algorithm is public domain); no third-party ``xxhash``
package exists in this environment.  Spark-side use goes through an
Arrow-batched pandas UDF — slower than the JVM-side md5 default and clearly
documented as the opt-in parity path, not the hot path.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of ``data`` (str hashed as UTF-8), matching Go xxhash seed-0."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, k1),
                _round(v2, k2),
                _round(v3, k3),
                _round(v4, k4),
            )
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ (k * _P1) & _M64, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes | str, seed: int = 0) -> int:
    """XXH64 reinterpreted as int64 (Spark/parquet have no uint64 column)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


_UDF_CACHE: dict[str, object] = {}


def _xxh64_udf():
    """Lazily-built pandas UDF (creating one needs an active SparkContext)."""
    if "udf" not in _UDF_CACHE:

        @pandas_udf("long")
        def xxh64_pandas(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else xxh64_signed(v))

        _UDF_CACHE["udf"] = xxh64_pandas
    return _UDF_CACHE["udf"]


def xxh64_col(col: Column | str) -> Column:
    """Spark column: XXH64(utf8 bytes), seed 0, as signed int64.

    Arrow-batched pandas UDF — the opt-in parity path.  For shard routing
    use :func:`shard_hash_faithful`, which recovers the unsigned modulo.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _xxh64_udf()(c)


def shard_hash_faithful(col: Column | str, shards: int) -> Column:
    """Byte-parity hash sharding: ``uint64(xxh64(v)) % shards``.

    The UDF returns the SIGNED reinterpretation; to recover the reference's
    unsigned modulo, add 2^64 mod shards to negative values before pmod:
    ``uint64 = signed + 2^64`` when signed < 0, and
    ``(signed + 2^64) % m == pmod(signed % m + (2^64 % m), m)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = _xxh64_udf()(c.cast("string"))
    m = int(shards)
    two64_mod = pow(2, 64, m)
    return F.when(
        h < 0, F.pmod(F.pmod(h, F.lit(m)) + F.lit(two64_mod), F.lit(m))
    ).otherwise(F.pmod(h, F.lit(m)))


def series_id_faithful(label_pairs: Column) -> Column:
    """Byte-parity Prometheus series id (reference model/message.go:195-205).

    ``label_pairs`` must be the already-concatenated ``###name###value``
    string (non-empty string labels, dim order) — the same bytes the
    reference streams into its digest.  Returns signed int64.
    """
    return _xxh64_udf()(label_pairs)
