"""Flow-matching scheduler tests.

Analytic ground truth: for a point-mass data distribution (the model
predicts x0 = c exactly, i.e. v = (x - c)/sigma), the flow ODE has the exact
solution x(sigma) = c + sigma * (x_1 - c) / sigma_1 — every x0-prediction
solver must follow it exactly at EVERY step, and all solvers must land on c.
Convergence-order checks then compare against a dense-Euler ground truth on
a genuinely curved problem.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.sampling.schedulers import (
    FlowDPMpp,
    FlowMatchEuler,
    FlowUniPC,
    make_scheduler,
    shifted_sigmas,
)


def test_shifted_sigmas_shape_and_monotone():
    sig = shifted_sigmas(30, shift=16.0)
    assert sig.shape == (31,)
    assert sig[0] == pytest.approx(16.0 / 16.0, abs=1e-6)  # shift(1)=1
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    # shift warps midpoints upward: sigma stays near 1 much longer
    unshifted = shifted_sigmas(30, shift=1.0)
    assert sig[15] > unshifted[15]


def _run_point_mass(scheduler, n_steps, shift, c=0.7, x1=2.0, check_every_step=False):
    scheduler.set_timesteps(n_steps, shift=shift)
    x = jnp.full((2, 3), x1, jnp.float32)
    sig = scheduler.sigmas
    for i in range(n_steps):
        s = float(sig[i])
        v = (x - c) / s  # exact velocity for point-mass data
        x = scheduler.step(v, i, x)
        if check_every_step and i + 1 < n_steps:
            want = c + float(sig[i + 1]) * (x1 - c) / float(sig[0])
            np.testing.assert_allclose(np.asarray(x), want, rtol=2e-4, atol=2e-4)
    return np.asarray(x)


@pytest.mark.parametrize("name", ["euler", "unipc", "dpm++"])
@pytest.mark.parametrize("shift", [1.0, 16.0])
def test_point_mass_exactness(name, shift):
    sched = make_scheduler(name)
    x = _run_point_mass(sched, 8, shift, check_every_step=(name != "euler"))
    np.testing.assert_allclose(x, 0.7, rtol=1e-3, atol=1e-3)


def _curved_problem(scheduler, n_steps, shift=3.0):
    """x0 'prediction' that depends on sigma: x0(sigma, x) = tanh(x) + sigma.
    Gives a genuinely curved ODE so solver order matters."""
    scheduler.set_timesteps(n_steps, shift=shift)
    x = jnp.asarray([[1.5, -0.5, 0.3]], jnp.float32)
    sig = scheduler.sigmas
    for i in range(n_steps):
        s = float(sig[i])
        x0 = jnp.tanh(x) + s
        v = (x - x0) / s
        x = scheduler.step(v, i, x)
    return np.asarray(x)


def _euler_dense_truth(n=4000, shift=3.0):
    sched = FlowMatchEuler()
    return _curved_problem(sched, n, shift)


def test_multistep_beats_euler_on_curved_problem():
    truth = _euler_dense_truth()
    err_euler = np.abs(_curved_problem(FlowMatchEuler(), 10) - truth).max()
    err_unipc = np.abs(_curved_problem(FlowUniPC(), 10) - truth).max()
    err_dpm = np.abs(_curved_problem(FlowDPMpp(), 10) - truth).max()
    assert err_unipc < err_euler * 0.5, (err_unipc, err_euler)
    assert err_dpm < err_euler * 0.5, (err_dpm, err_euler)


@pytest.mark.parametrize("cls", [FlowUniPC, FlowDPMpp])
def test_multistep_converges(cls):
    truth = _euler_dense_truth()
    e10 = np.abs(_curved_problem(cls(), 10) - truth).max()
    e40 = np.abs(_curved_problem(cls(), 40) - truth).max()
    assert e40 < e10


def test_timesteps_scale():
    sched = FlowMatchEuler()
    ts = sched.set_timesteps(30, shift=16.0)
    assert len(ts) == 30
    assert ts[0] == pytest.approx(1000.0, rel=1e-5)
    assert ts[-1] > 0


def test_state_resets_between_runs():
    sched = FlowUniPC()
    a = _run_point_mass(sched, 6, 5.0)
    b = _run_point_mass(sched, 6, 5.0)
    np.testing.assert_array_equal(a, b)
