"""Geo-DB refresh orchestration: pick up a new geo database mid-stream.

The reference re-downloads its geo databases daily on a timer and restarts
the whole process so every lookup uses the new data (reference
``util/auto_update.go:19-43``, wired via ``config.Geoipupdate``,
``config/config.go:296-299``).

Spark shape: restart-free.  The enrichment join takes the geo interval
table as a *DataFrame argument* (enrich.enrich_ips), and foreachBatch
re-resolves the plan every epoch — so swapping the DataFrame between
micro-batches re-broadcasts the new table with zero downtime.  The
:class:`GeoDbRefresher` below decides *when* to swap: a cheap mtime stat on
the source file per epoch plus a wall-clock interval (the reference's daily
cron), never a data read unless something changed.  At 1000 executors this
costs one driver-side ``stat()`` per micro-batch and one broadcast per
actual refresh.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class GeoDbRefresher:
    """Reload the geo ranges DataFrame when the backing DB changes.

    ``load`` builds a fresh DataFrame (e.g. ``spark.read.parquet`` of the
    converted qqwry table); ``watch_path`` is stat'ed for mtime changes
    (the reference's downloader replaces the file in place);
    ``interval_s`` forces a reload even without an mtime change, mirroring
    the reference's unconditional daily refresh (qqwry.dat timestamps are
    not always monotonic across mirrors).
    """

    load: Callable[[], DataFrame]
    watch_path: str = ""
    interval_s: float = 86400.0
    _df: DataFrame | None = field(default=None, repr=False)
    _loaded_at: float = field(default=0.0, repr=False)
    _mtime: float = field(default=-1.0, repr=False)
    _reloads: int = field(default=0, repr=False)

    @property
    def reloads(self) -> int:
        return self._reloads

    def _stat_mtime(self) -> float:
        if not self.watch_path:
            return -1.0
        try:
            st = os.stat(self.watch_path)
        except OSError:
            return -1.0
        # a directory (parquet output) bumps its own mtime on rewrite; also
        # consider its direct children so an in-place part-file swap counts
        mtime = st.st_mtime
        if os.path.isdir(self.watch_path):
            for name in os.listdir(self.watch_path):
                try:
                    mtime = max(
                        mtime, os.stat(os.path.join(self.watch_path, name)).st_mtime
                    )
                except OSError:
                    continue
        return mtime

    def stale(self, now: float | None = None) -> bool:
        if self._df is None:
            return True
        now = time.time() if now is None else now
        if now - self._loaded_at >= self.interval_s:
            return True
        mtime = self._stat_mtime()
        return mtime != self._mtime

    def current(self, now: float | None = None) -> DataFrame:
        """The geo table to use for this epoch, reloading if stale."""
        if self.stale(now):
            self._df = self.load()
            self._loaded_at = time.time() if now is None else now
            self._mtime = self._stat_mtime()
            self._reloads += 1
        return self._df


def geo_enriched_batch_writer(
    refresher: GeoDbRefresher,
    ip_int_col: str,
    write: Callable[[DataFrame, int], None],
    out_prefix: str = "",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback: enrich each micro-batch against the CURRENT
    geo table, then hand off to ``write``.

    This is the refresh integration point the reference solves with a full
    process restart: because the broadcast join is re-planned per epoch,
    a refresher swap is visible in the very next micro-batch.
    """
    from ..enrich import enrich_ips

    def _write(df: DataFrame, epoch_id: int) -> None:
        geo = refresher.current()
        write(enrich_ips(df, geo, ip_int_col, out_prefix=out_prefix), epoch_id)

    return _write
