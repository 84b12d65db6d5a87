"""Fast-suite oracle coverage for the queries the driver's correctness
window misses.

The driver checks the FIRST 50 ``queries()`` entries; the full-registry
sweep exists but is ``slow``-marked, so ``pytest -m "not slow"`` (the
per-change gate) historically never touched the other ~130 oracles.  This
test closes that gap with a ROTATING subset: each calendar day selects a
different deterministic chunk of the post-window registry, so every query
outside the driver window gets oracle-checked within one rotation period
(~5 days of runs) while each individual run stays inside the fast-suite
budget.  The full sweep remains the authoritative all-at-once gate
(``pytest -m slow`` / ``scripts/check_oracle.py``).

The rotation key is the current COMMIT (HEAD sha), falling back to the
calendar day outside a git checkout: a given commit's fast-suite result
is therefore reproducible — the same tree always checks the same chunk —
while successive commits walk different chunks, so a regression in an
unselected chunk surfaces within a few commits or the slow sweep (the
r5 date key made one commit green on Monday and red on Tuesday with no
code change: r5 ADVICE).  Set ``ORACLE_ROTATION_CHUNK=<n>`` to pin a
chunk (debugging a specific failure), or ``ORACLE_ROTATION_CHUNK=all``
to sweep everything.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50  # entries the driver's CORRECTNESS gate already covers
CHUNK_SIZE = 26


def _rotation_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as mod

    names = list(mod.queries())[DRIVER_WINDOW:]
    n_chunks = (len(names) + CHUNK_SIZE - 1) // CHUNK_SIZE
    pin = os.environ.get("ORACLE_ROTATION_CHUNK")
    if pin == "all":
        return names
    if pin is not None:
        idx = int(pin) % n_chunks
    else:
        idx = _rotation_key() % n_chunks
    return names[idx * CHUNK_SIZE : (idx + 1) * CHUNK_SIZE]


def _rotation_key() -> int:
    """Stable per-commit key: HEAD sha when available (same tree → same
    chunk, reproducible per commit), else the calendar day (still rotates
    on exported tarballs, the r1-r5 behavior)."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        if sha:
            return int(sha[:12], 16)
    except Exception:
        pass
    return datetime.date.today().toordinal()


def test_oracle_rotation_chunk(tmp_path):
    subset = _rotation_names()
    assert subset, "rotation selected no queries — registry shrank?"
    report = tmp_path / "report.txt"
    env = dict(os.environ, CHECK_ORACLE_REPORT=str(report))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "check_oracle.py"),
            "/root/testdata/sf0.001",
            *subset,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    lines = report.read_text().splitlines() if report.exists() else []
    failures = [ln for ln in lines if ln.startswith("FAIL")]
    n_checked = sum(1 for ln in lines if ln.startswith(("ok", "weak")))
    assert proc.returncode == 0, (
        f"rotating oracle chunk failed (rc={proc.returncode}):\n"
        + "\n".join(failures[:30])
        + ("\n...stderr tail:\n" + proc.stderr[-2000:] if proc.returncode else "")
    )
    assert n_checked == len(subset), (
        f"only {n_checked}/{len(subset)} of the chunk ran — name drift "
        "between the registry and check_oracle?"
    )
