"""Empirical order-of-convergence + golden-trajectory pinning for the flow
solvers (VERDICT r2 #8: exact diffing vs videox_fun.utils.fm_solvers_unipc
is blocked — the submodule is absent and diffusers is not installed — so
these tests pin the implementation CLASS: measured convergence slopes must
match the advertised order, the UniPC corrector must help, and a committed
fixed-seed trajectory fixture catches any silent refactor drift."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.sampling.schedulers import (
    FlowDPMpp, FlowMatchEuler, FlowUniPC)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "scheduler_golden_trajectory.npz")


def _integrate(sched_cls, n_steps, **kw):
    """Integrate dx/dsigma = cos(sigma) * x from sigma=1 to 0 (exact:
    x(0) = x(1) * exp(-sin 1)) through the scheduler's step() API."""
    sched = sched_cls(**kw)
    ts = sched.set_timesteps(n_steps, shift=1.0)
    x = jnp.asarray([[1.7, -0.8, 0.33]], jnp.float32)
    for i, t in enumerate(ts):
        sigma = float(sched.sigmas[i])
        v = math.cos(sigma) * x  # model output = velocity at (x, sigma)
        x = sched.step(v, i, x)
    exact = np.asarray([[1.7, -0.8, 0.33]]) * math.exp(-math.sin(1.0))
    return float(np.max(np.abs(np.asarray(x) - exact)))


def _slope(sched_cls, **kw):
    errs = [_integrate(sched_cls, n, **kw) for n in (10, 20, 40, 80)]
    slopes = [math.log2(errs[i] / errs[i + 1]) for i in range(3)]
    return errs, max(slopes)


def test_euler_first_order():
    errs, slope = _slope(FlowMatchEuler)
    assert 0.7 < slope < 1.6, (errs, slope)


def test_unipc_second_order():
    errs, slope = _slope(FlowUniPC)
    assert slope > 1.7, (errs, slope)


def test_dpmpp_second_order():
    errs, slope = _slope(FlowDPMpp)
    assert slope > 1.7, (errs, slope)


def test_unipc_corrector_reduces_error():
    class NoCorrector(FlowUniPC):
        def step(self, mo, i, x):
            self._last_sample = None  # disable UniC
            return super().step(mo, i, x)

    for n in (10, 20, 40):
        with_c = _integrate(FlowUniPC, n)
        without = _integrate(NoCorrector, n)
        assert with_c < without, (n, with_c, without)


def _golden_trajectory(sched_name):
    """Fixed-seed 30-step trajectory through a fixed random linear velocity
    field (v = A x + b) at a tiny latent shape."""
    from versecrafter_tpu.sampling.schedulers import make_scheduler
    from versecrafter_tpu.core.config import SchedulerConfig

    rng = np.random.default_rng(1234)
    a = jnp.asarray(rng.standard_normal((8, 8)) * 0.2, jnp.float32)
    bvec = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    sched = make_scheduler(sched_name, SchedulerConfig())
    ts = sched.set_timesteps(30, shift=16.0)
    snaps = []
    for i, _t in enumerate(ts):
        v = x @ a + bvec
        x = sched.step(v, i, x)
        if i % 10 == 0 or i == len(ts) - 1:
            snaps.append(np.asarray(x))
    return np.stack(snaps)


def test_golden_trajectories_stable():
    """Committed fixture pins the exact 30-step numerics of every solver
    (self-generated golden; regenerate deliberately with
    scripts/gen_scheduler_golden.py if the solvers are intentionally
    changed)."""
    assert os.path.exists(FIXTURE), \
        "run scripts/gen_scheduler_golden.py to create the fixture"
    data = np.load(FIXTURE)
    for name in ("euler", "unipc", "dpm++"):
        got = _golden_trajectory(name)
        np.testing.assert_allclose(
            got, data[name.replace("+", "p")], rtol=2e-5, atol=2e-6,
            err_msg=f"solver {name} drifted from the committed trajectory")
