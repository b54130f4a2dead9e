"""Cold-compile regression gate (round-5 let_expr lesson): a query
whose fresh-plan codegen blows up (t7 was 150 s, t14 12 s before their
rewrites) must redden locally, not in the judge's sweep. Runs
tools/cold_check.py in a SUBPROCESS so every plan is genuinely cold —
the suite's shared session has already compiled most registered
queries by the time any in-process test could measure them."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.coldgate
def test_no_query_exceeds_cold_ceiling():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cold_check.py")],
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO, "COLD_CEILING_S": "20"},
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"cold-compile gate failed:\n{proc.stdout[-3000:]}"
