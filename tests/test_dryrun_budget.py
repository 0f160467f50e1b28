"""Driver-signal budget guard (VERDICT r4 next 8).

The driver runs `dryrun_multichip(8)` in a fresh process with a hard timeout
(~580 s, see .claude/skills/verify); round 3 was burned by an unbudgeted
compile surface blowing that limit on a cold 1-core host. This test runs the
entry point exactly like the driver (fresh subprocess, default env) and
asserts the wall-clock stays inside the budget with margin, so any growth of
the dryrun's compile surface (a new trainer variant, a bigger tiny config)
fails CI before it fails the driver.
"""
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_S = 480  # driver timeout ~580 s; keep >= 100 s of margin


@pytest.mark.slow
def test_dryrun_multichip_fits_driver_budget():
    env = dict(os.environ)
    # drop the pytest conftest's platform forcing; the entry point
    # self-provisions its virtual CPU mesh like under the driver
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=BUDGET_S)
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ok" in proc.stdout, proc.stdout[-2000:]
    assert wall < BUDGET_S, f"dryrun took {wall:.0f}s (budget {BUDGET_S}s)"
