"""Geo-DB auto-update: download → integrity check → atomic replace.

Twin of the reference's daily geo-database refresh (reference
``util/auto_update.go:19-43``: a cron job runs ``QqwryDownload`` /
``Zxipv6wry_Download`` / ``CdnDownload``, overwrites the local files, and
restarts the whole process via systemctl).  Differences by design:

- **Restart-free.**  The reference restarts the daemon so lookups see the
  new file; here :class:`~..streaming.refresh.GeoDbRefresher` watches the
  file's mtime and re-broadcasts the interval table on the next
  micro-batch, so a completed :meth:`GeoDbFetcher.fetch` is live within
  one epoch with zero downtime.
- **Integrity-checked.**  The reference writes whatever the mirror
  returned (reference ``util/qqwry_update.go:20-24`` removes the old file
  first, so a bad download loses the previous DB).  Here the payload is
  validated BEFORE touching the destination and replaced atomically
  (``os.replace`` of a same-directory temp file), so a failed or corrupt
  download always leaves the last good database in place.

The qqwry mirror serves a scrambled container: the first 0x200 bytes are
XOR-ed with an evolving key fetched from ``copywrite.rar``, and the whole
payload is zlib-compressed (reference ``util/qqwry_update.go:46-74``).
``qqwry_descramble`` / ``copywrite_key`` are the pure-function twins so
the decode is unit-testable without a network.
"""

from __future__ import annotations

import os
import struct
import tempfile
import threading
import zlib
from dataclasses import dataclass, field
from typing import Callable
from urllib.request import urlopen


def fetch_url(url: str, timeout: float = 60.0) -> bytes:
    """Download ``url`` fully into memory (file:// and http(s):// both
    work — tests use file://; the geo databases are ~10 MB)."""
    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 — URL is operator config
        return resp.read()


def copywrite_key(blob: bytes) -> int:
    """Decode key from the mirror's ``copywrite.rar`` blob: the little-
    endian uint32 at byte offset 20 (reference util/qqwry_update.go:64-74)."""
    return struct.unpack_from("<I", blob, 5 * 4)[0]


def qqwry_descramble(payload: bytes, key: int) -> bytes:
    """Undo the qqwry mirror's scrambling (reference util/qqwry_update.go:
    46-61): XOR the first 0x200 bytes with the evolving key stream
    (key = (key*0x805 + 1) & 0xff per byte), then zlib-decompress the
    whole payload."""
    data = bytearray(payload)
    for i in range(min(0x200, len(data))):
        key = (key * 0x805 + 1) & 0xFF
        data[i] ^= key
    return zlib.decompress(bytes(data))


# ---------------------------------------------------------------------------
# Payload validators: cheap structural probes run BEFORE replacing the file
# ---------------------------------------------------------------------------


def validate_qqwry(data: bytes) -> bool:
    """Header sanity + first-record walk of a qqwry.dat payload."""
    if len(data) < 8 + 7:
        return False
    first, last = struct.unpack_from("<II", data, 0)
    if not (8 <= first <= last < len(data)):
        return False
    if (last - first) % 7 != 0:
        return False
    try:
        from .qqwry import iter_qqwry

        next(iter_qqwry(data))
    except Exception:  # noqa: BLE001 — any parse failure (or no records) rejects
        return False
    return True


def validate_json(data: bytes) -> bool:
    """cdn.json-style payloads must parse as a non-empty JSON object."""
    import json

    try:
        obj = json.loads(data.decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return False
    return isinstance(obj, dict) and bool(obj)


def validate_nonempty(data: bytes) -> bool:
    return len(data) > 0


@dataclass
class GeoDbFetcher:
    """One database's update pipeline: URL → (transform) → validate →
    atomic replace of ``dest_path``.

    ``transform`` maps the raw download to the on-disk format (e.g. the
    qqwry descramble+decompress); ``validate`` rejects corrupt payloads
    without touching the existing file.  ``fetch()`` returns True when the
    destination was replaced; failures record ``last_error`` and leave the
    previous database untouched (improving on the reference's
    remove-then-write, which can destroy the old DB on a bad mirror day).
    """

    url: str
    dest_path: str
    transform: Callable[[bytes], bytes] | None = None
    validate: Callable[[bytes], bool] = validate_nonempty
    timeout: float = 60.0
    fetched: int = field(default=0, repr=False)
    last_error: str = field(default="", repr=False)

    def fetch(self) -> bool:
        try:
            data = fetch_url(self.url, self.timeout)
            if self.transform is not None:
                data = self.transform(data)
            if not self.validate(data):
                raise ValueError(f"payload failed integrity check ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001 — keep last good DB on ANY failure
            self.last_error = f"{type(e).__name__}: {e}"
            return False
        dest_dir = os.path.dirname(os.path.abspath(self.dest_path)) or "."
        os.makedirs(dest_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(prefix=".geodb.", dir=dest_dir)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.replace(tmp, self.dest_path)  # atomic on same filesystem
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        self.fetched += 1
        self.last_error = ""
        return True


def qqwry_fetcher(
    url: str, dest_path: str, key_url: str | None = None, timeout: float = 60.0
) -> GeoDbFetcher:
    """Fetcher for the scrambled qqwry mirror format.  ``key_url`` serves
    the copywrite blob; plain (unscrambled) mirrors pass key_url=None and
    get the raw payload validated as-is."""
    if key_url is None:
        return GeoDbFetcher(
            url=url, dest_path=dest_path, validate=validate_qqwry, timeout=timeout
        )

    def transform(payload: bytes) -> bytes:
        key = copywrite_key(fetch_url(key_url, timeout))
        return qqwry_descramble(payload, key)

    return GeoDbFetcher(
        url=url,
        dest_path=dest_path,
        transform=transform,
        validate=validate_qqwry,
        timeout=timeout,
    )


@dataclass
class GeoUpdateCron:
    """Interval twin of the reference's daily update cron (reference
    util/auto_update.go:19-25): runs every fetcher on a timer thread.
    There is deliberately no restart step — the mtime bump from a
    successful fetch is the whole hand-off to ``GeoDbRefresher``.
    """

    fetchers: list[GeoDbFetcher]
    interval_s: float = 86400.0
    on_update: Callable[[GeoDbFetcher], None] | None = None
    _stop: threading.Event = field(default_factory=threading.Event, repr=False)
    _thread: threading.Thread | None = field(default=None, repr=False)

    def run_once(self) -> int:
        """Fetch every database; returns how many files were replaced."""
        n = 0
        for fetcher in self.fetchers:
            if fetcher.fetch():
                n += 1
                if self.on_update is not None:
                    self.on_update(fetcher)
        return n

    def start(self) -> None:
        def loop() -> None:
            while not self._stop.wait(self.interval_s):
                self.run_once()

        self._stop.clear()
        self._thread = threading.Thread(target=loop, daemon=True, name="geo-update")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
