"""Multi-host dryrun (VERDICT r3 #6): 2 OS processes x 4 virtual CPU
devices, initialized into one jax.distributed world through the
VERSECRAFTER_MULTIHOST hook, running a sharded denoise with real
cross-process (Gloo) collectives — the stand-in for the reference's
torchrun-spawned multi-rank model server (model_server.py:46-48)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multihost_2x4():
    # subprocess keeps the test session's own backend (virtual 8-dev CPU)
    # untouched; the entry spawns the two worker processes itself
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "--multihost", "2", "4"],
        capture_output=True, text=True, timeout=560,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "dryrun_multihost(2x4) OK" in out.stdout
    assert "sharded denoise steps OK" in out.stdout
