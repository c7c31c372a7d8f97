"""Regenerate tests/data/scheduler_golden_trajectory.npz (run only when the
solvers are INTENTIONALLY changed; see tests/test_scheduler_convergence.py)."""
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # eager ops on axon are ~0.3 s remote dispatches

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_scheduler_convergence import FIXTURE, _golden_trajectory  # noqa: E402

out = {name.replace("+", "p"): _golden_trajectory(name)
       for name in ("euler", "unipc", "dpm++")}
np.savez(FIXTURE, **out)
print("wrote", FIXTURE, {k: v.shape for k, v in out.items()})
