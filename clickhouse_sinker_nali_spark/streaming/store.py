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
    """Whole-store swap without a delete-then-write crash window.

    Writes ``store_path/v_<version>`` via a side directory (a replayed
    epoch rewrites its own version — and may be lazily READING it, so
    the data lands in ``v_<version>__tmp`` first and is swapped in) then
    atomically replaces the CURRENT pointer file.  A crash before the pointer update leaves the previous
    version intact and current; after, the new one.  Superseded version
    directories are garbage-collected after the flip (keeping the
    immediate predecessor for readers that resolved CURRENT just before
    the swap) — without GC a long-running topk/HLL stream leaves one full
    store copy on disk per epoch.  Returns the data directory written.
    """
    import shutil

    vdir = os.path.join(store_path, f"v_{version}")
    # Write to a side directory FIRST, then swap into place.  A replayed
    # epoch (crash between the pointer flip and the checkpoint commit)
    # re-runs with CURRENT already pointing at v_<version>, and its merge
    # plan lazily READS that directory — a direct overwrite of the path a
    # plan is reading from fails ("Cannot overwrite a path that is also
    # being read from") on every replay, wedging the stream permanently.
    # Writing the side dir materializes the read before the old copy is
    # touched.
    tmp_dir = os.path.join(store_path, f"v_{version}__tmp")
    df.write.mode("overwrite").parquet(tmp_dir)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    os.rename(tmp_dir, vdir)
    os.makedirs(store_path, exist_ok=True)
    tmp = os.path.join(store_path, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(f"v_{version}\n")
    os.replace(tmp, os.path.join(store_path, "CURRENT"))
    _gc_versions(store_path, version)
    return vdir


def _gc_versions(store_path: str, current: int) -> None:
    """Delete version dirs other than ``current`` and its immediate
    predecessor (kept for in-flight readers that read CURRENT pre-flip).
    Versions NEWER than current are stale leftovers from a crash between
    data write and pointer flip on a later epoch that then got replayed —
    CURRENT never pointed at them, so they are garbage too."""
    import shutil

    versions = []
    for name in os.listdir(store_path):
        if name.endswith("__tmp"):  # stale side dir from a crashed write
            shutil.rmtree(os.path.join(store_path, name), ignore_errors=True)
            continue
        if name.startswith("v_"):
            try:
                versions.append(int(name[2:]))
            except ValueError:
                continue
    keep = {current}
    older = [v for v in versions if v < current]
    if older:
        keep.add(max(older))
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(store_path, f"v_{v}"), ignore_errors=True)


def read_versioned(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Read the CURRENT version of a :func:`versioned_swap_write` store."""
    cur = os.path.join(store_path, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        vdir = f.read().strip()
    return spark.read.parquet(os.path.join(store_path, vdir))
