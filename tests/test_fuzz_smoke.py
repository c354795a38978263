"""One pass of the differential fuzz campaign as a suite gate.

Runs tools/fuzz_oracle.py for one iteration of every op at a fixed seed
(distinct from the seeds exercised manually, so each suite run adds a
randomized-but-reproducible case set on top of the fixed-case parity
tests). ~40 s on CPU JAX with a warm compile cache.
"""

import os
import subprocess
import sys

import pytest

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fuzz_one_iteration_per_op():
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools", "fuzz_oracle.py"),
         "--iters", "14", "--seed", "3"],  # = len(OPS): one case per op
        capture_output=True, text=True, timeout=1200, cwd=_ROOT,
    )
    assert proc.returncode == 0, f"fuzz failures:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    assert "0 failures" in proc.stdout
