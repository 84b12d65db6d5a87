"""CI insurance for the 120+ queries outside the driver's 50-query
correctness window: run the FULL ``check_oracle.py`` sweep (every
``queries()`` entry vs its DuckDB oracle) at sf0.001 and require zero
failures.

A canonicalization seam or operator regression anywhere in the registry
now fails ``pytest -m slow``, not just the manual sweep.  Runs in a
subprocess so the checker gets the exact same entrypoint the humans (and
docs) use, and so its ``sys.exit`` status is the assertion.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_oracle_sweep_sf0001(tmp_path):
    report = tmp_path / "report.txt"
    env = dict(os.environ, CHECK_ORACLE_REPORT=str(report))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"),
         "/root/testdata/sf0.001"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = report.read_text().splitlines() if report.exists() else []
    failures = [ln for ln in lines if ln.startswith("FAIL")]
    n_ok = sum(1 for ln in lines if ln.startswith("ok"))
    assert proc.returncode == 0, (
        f"oracle sweep failed (rc={proc.returncode}):\n" + "\n".join(failures[:30])
        + ("\n...stderr tail:\n" + proc.stderr[-2000:] if proc.returncode else "")
    )
    # guard against a silently-empty sweep: the registry holds >150 queries
    assert n_ok >= 150, f"only {n_ok} queries ran — registry or sweep broken"
