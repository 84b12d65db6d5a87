"""Serving-store helpers shared by the foreachBatch maintainers.

Two failure classes kept biting the per-sink copies of this logic:

- a BARE ``except`` around the previous-state read turned ANY transient
  read failure (FS hiccup, corrupt footer, permissions) into "first
  epoch", silently wiping state that merge-style sinks then rebuilt only
  partially.  :func:`read_store_or_none` distinguishes path-not-found
  (legitimately None) from real failures (re-raised).
- delete-then-write overwrite of the whole store is a crash window AND an
  O(store) cost per epoch.  :func:`versioned_swap_write` keeps whole-store
  swaps crash-safe via a version directory + an atomically-replaced
  CURRENT pointer (readers never observe a half-written store; a replayed
  epoch rewrites its own version directory, so recovery converges).
  Sinks whose state is naturally keyed should prefer partitioned stores
  with dynamic partition overwrite instead (see
  ``streaming_scd2_maintenance``) — per-epoch IO then scales with touched
  partitions, not the store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _is_path_missing(err: Exception) -> bool:
    msg = str(err)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "Unable to infer schema" in msg  # empty dir: treat as absent
    )


def read_store_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet store; None ONLY when it does not exist yet.

    Any other failure propagates — treating a transient read error as
    "no previous state" makes a merge-style maintainer silently drop
    every key the current batch did not touch.
    """
    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution now, inside the guarded scope
        return df
    except Exception as e:  # noqa: BLE001 — classified below
        if _is_path_missing(e):
            return None
        raise


def versioned_swap_write(df: DataFrame, store_path: str, version: int) -> str:
    """Whole-store swap with NO window where CURRENT dangles.

    The write NEVER touches a directory CURRENT might reference: a fresh
    epoch writes ``v_<version>`` directly; a REPLAYED epoch (its dir
    already exists — and CURRENT may point at it, and the replay's merge
    plan may be lazily READING it) writes under a new suffixed name
    ``v_<version>__r<k>``.  Only after the data is fully on disk is the
    CURRENT pointer file atomically replaced to name the new directory,
    and only after THAT are superseded directories garbage-collected
    (keeping the immediately-previous CURRENT target for in-flight
    readers that resolved the pointer pre-flip).  A crash at any point
    leaves CURRENT naming a complete, existing directory — the r5 scheme
    deleted the old dir before renaming the new one into place, so a
    crash between the two left CURRENT dangling at nothing and the next
    replay's merge read failed (r5 ADVICE).  Partial directories from
    crashed writes are cleaned by the next successful write's GC.
    Returns the data directory written.
    """
    vdir = os.path.join(store_path, f"v_{version}")
    target = vdir
    if os.path.exists(vdir):
        k = 1
        while os.path.exists(f"{vdir}__r{k}"):
            k += 1
        target = f"{vdir}__r{k}"
    df.write.mode("overwrite").parquet(target)
    os.makedirs(store_path, exist_ok=True)
    cur_file = os.path.join(store_path, "CURRENT")
    prev_name = None
    if os.path.exists(cur_file):
        with open(cur_file) as f:
            prev_name = f.read().strip()
    tmp = os.path.join(store_path, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(os.path.basename(target) + "\n")
    os.replace(tmp, cur_file)
    _gc_versions(store_path, keep={os.path.basename(target), prev_name})
    return target


def _parse_version_name(name: str) -> tuple[int, int] | None:
    """``v_<n>`` → (n, 0); ``v_<n>__r<k>`` (replay rewrite) → (n, k);
    anything else → None."""
    if not name.startswith("v_"):
        return None
    body = name[2:]
    base, _, rk = body.partition("__r")
    try:
        return (int(base), int(rk) if rk else 0)
    except ValueError:
        return None


def _gc_versions(store_path: str, keep: set) -> None:
    """Delete every version directory whose name is not in ``keep`` —
    the just-flipped CURRENT target plus the previous CURRENT target
    (in-flight readers).  This sweeps superseded versions, partial
    directories from crashed writes (CURRENT never named them), stale
    replay rewrites, and legacy ``__tmp`` side dirs — without GC a
    long-running topk/HLL stream leaves one full store copy per epoch,
    and a crash between write and flip would leak its partial dir
    forever."""
    import shutil

    for name in os.listdir(store_path):
        if name in keep:
            continue
        if name.endswith("__tmp") or _parse_version_name(name) is not None:
            shutil.rmtree(os.path.join(store_path, name), ignore_errors=True)


def read_versioned(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Read the CURRENT version of a :func:`versioned_swap_write` store."""
    cur = os.path.join(store_path, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        vdir = f.read().strip()
    return spark.read.parquet(os.path.join(store_path, vdir))
