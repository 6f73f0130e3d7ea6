"""Projected-magnitude seam lint, pinned as a test (VERDICT r10 item 3).

SURVEY §5.3.9: the ROUND-magnitude seam threshold is data-scale-
dependent — a rounded float SUM that is safe at the tested SF crosses
the product-2^53 bound (~9e11, where DuckDB's float-product ROUND
flips on the identical double) at the 100 TB target. The round-11
audit (scripts/magnitude_lint.py at sf0.01/sf0.1: 49 findings over 38
keys) re-spelled every flagged grower onto exact integer-quantized
moments with UNROUNDED emission; this test keeps the discipline from
regressing as new keys register.

Runs the same lint on the cheaper (sf0.001, sf0.01) pair — the fact
tables still scale 10x across it — with one extra projection decade to
reach the same target. A finding here means a newly registered (or
edited) key emits a terminal-ROUND-ed grower column: re-spell it per
§5.3.9(a) (exact moments, unrounded), do not allowlist it.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_rounded_grower_columns():
    env = dict(
        os.environ,
        TFK_LINT_LO="/root/testdata/sf0.001",
        TFK_LINT_HI="/root/testdata/sf0.01",
        TFK_LINT_DECADES="8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "magnitude_lint.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        "magnitude lint found rounded grower columns (re-spell per SURVEY"
        f" §5.3.9a):\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    # non-vacuity: the lint must actually have surveyed the registry
    assert "0 findings, 0 oracle errors" in proc.stdout, proc.stdout
