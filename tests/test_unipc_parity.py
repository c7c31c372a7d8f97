"""Implementation-independent UniPC parity fixtures (VERDICT r3 #9).

The reference's FlowUniPCMultistepScheduler (videox_fun fm_solvers_unipc,
consumed at versecrafter_inference.py:252-261) is absent from the mount, so
golden trajectories cannot be dumped from it. These tests instead pin the
repo's FlowUniPC to the PUBLISHED UniPC formulation (Zhao et al. 2023,
"UniPC: A Unified Predictor-Corrector Framework", data-prediction / bh2
variant, in the flow-matching sigma parameterization) through three
independent means:

1. A hand-written float64 numpy recursion of the published update rules,
   derived here from the paper's equations and the documented
   diffusers-style step protocol (correct the incoming sample with UniC,
   recompute the data prediction from the CORRECTED sample with the stale
   model output, then advance with UniP) — NOT from the repo's jnp code.
   If the repo's coefficients drift (wrong phi-function, B(h), r_k, or
   sign), this diverges at the first affected step.
2. An analytic exactness invariant: for a constant data oracle x0 == c the
   corrector's difference term vanishes and every UniPC step must land on
   the closed-form exact flow-ODE solution
   x(s) = (s/s0) x(s0) + s c (a/s - a0/s0), a = 1-s.
3. Hardcoded literal step values computed once from (1) — a tripwire even
   against a future simultaneous edit of both implementations here.
"""

import math

import numpy as np

from versecrafter_tpu.core.config import SchedulerConfig
from versecrafter_tpu.sampling.schedulers import FlowUniPC, shifted_sigmas

SHIFT = 16.0
N = 5


def _lam(sigma):
    sigma = min(max(float(sigma), 1e-6), 1 - 1e-6)
    return math.log((1.0 - sigma) / sigma)


# --------------------------------------------------------------------------
# published update rules, written out in float64 numpy
# --------------------------------------------------------------------------

def _phi(k, h):
    """phi-functions: phi_1(h) = expm1(h)/h, phi_{k+1} = (phi_k - 1/k!)/h."""
    p = math.expm1(h) / h
    for j in range(1, k):
        p = (p - 1.0 / math.factorial(j)) / h
    return p


def _unic_bh2(x_prev, x0_prev, x0_new, s_prev, s_new, rho=0.5):
    """UniC-1 corrector, data prediction, B(h)=expm1(h) ("bh2"):
    x_c = (s_t/s_s) x_s - a_t*phi1*D_s - a_t*B(h)*rho*(D_t - D_s),
    phi1 = expm1(-h), h = lam_t - lam_s, a_t = 1 - s_t. rho=0.5 is the
    published order-1 special case."""
    h = _lam(s_new) - _lam(s_prev)
    phi1 = math.expm1(-h)
    a_t = 1.0 - s_new
    return (s_new / s_prev) * x_prev - a_t * phi1 * x0_prev \
        - a_t * phi1 * rho * (x0_new - x0_prev)


def _unic2(x_prev, D_old, D_s, D_t, lam_old, s_prev, s_new):
    """UniC-2 corrector: coefficients a solve the Taylor system
    R a = g with R_{i,m} = r_m^{i-1} over r = [(lam_old-lam_s)/h, 1] and
    g_i = i! * hh * phi_{i+1}(hh) / B(hh), hh = -h (data-prediction side),
    B = expm1. Update: x_c = (s_t/s_s) x_s - a_t phi1 D_s
    - a_t B [a_1 (D_old - D_s)/r_1 + a_2 (D_t - D_s)]."""
    lam_s, lam_t = _lam(s_prev), _lam(s_new)
    h = lam_t - lam_s
    hh = -h
    B = math.expm1(hh)
    r1 = (lam_old - lam_s) / h
    R = np.array([[1.0, 1.0], [r1, 1.0]])
    g = np.array([math.factorial(i) * hh * _phi(i + 1, hh) / B
                  for i in (1, 2)])
    a1, a2 = np.linalg.solve(R, g)
    acc = a1 * (D_old - D_s) / r1 + a2 * (D_t - D_s)
    a_t = 1.0 - s_new
    return (s_new / s_prev) * x_prev - a_t * B * D_s - a_t * B * acc


def _unip1(x, x0, s_from, s_to):
    """First-order predictor (DPM-Solver++(1) == UniP-1):
    x_t = (s_t/s_s) x_s - a_t * expm1(-h) * D_s."""
    h = _lam(s_to) - _lam(s_from)
    return (s_to / s_from) * x - (1.0 - s_to) * math.expm1(-h) * x0


def _unip2(x, x0_old, x0_new, s_old, s_from, s_to, rho=0.5):
    """UniP-2 predictor (the paper's order-2 coefficient rho=0.5):
    x_t = (s_t/s_s) x_s - a_t*phi1*D_s - a_t*B(h)*rho*(D_old - D_s)/r1,
    r1 = (lam_old - lam_s)/h."""
    h = _lam(s_to) - _lam(s_from)
    phi1 = math.expm1(-h)
    r1 = (_lam(s_old) - _lam(s_from)) / h
    return (s_to / s_from) * x - (1.0 - s_to) * phi1 * x0_new \
        - (1.0 - s_to) * phi1 * rho * (x0_old - x0_new) / r1


def _oracle_x0(lam, a=0.3, b=-0.2):
    return a + b * lam


def _hand_unipc_traj(x_init=1.0, a=0.3, b=-0.2, steps=N):
    """Full order-2 UniPC trajectory from the published step protocol:
    predict (order 1 cold start) -> at each later step correct the incoming
    prediction, recompute D from the corrected sample with the stale model
    output, predict onward; final step returns the corrected sample's D."""
    sig = shifted_sigmas(steps, SHIFT).astype(np.float64)
    d_or = [_oracle_x0(_lam(s), a, b) for s in sig[:steps]]
    traj = []
    x = float(x_init)
    v0 = (x - d_or[0]) / sig[0]
    x0_hist = [x - sig[0] * v0]
    lam_hist = [_lam(sig[0])]
    pred = _unip1(x, x0_hist[0], sig[0], sig[1])
    traj.append(pred)
    last_sample = x
    for i in range(1, steps):
        v = (pred - d_or[i]) / sig[i]  # model output evaluated ON pred
        x0_raw = pred - sig[i] * v
        if len(x0_hist) == 1:  # UniC-1: published rho=0.5 special case
            x_corr = _unic_bh2(last_sample, x0_hist[-1], x0_raw,
                               sig[i - 1], sig[i])
        else:  # UniC-2: solved Taylor system
            x_corr = _unic2(last_sample, x0_hist[-2], x0_hist[-1], x0_raw,
                            lam_hist[-2], sig[i - 1], sig[i])
        x0_corr = x_corr - sig[i] * v  # data pred from CORRECTED sample
        if i == steps - 1:
            traj.append(x0_corr)  # final step: exact first-order to s=0
            break
        nxt = _unip2(x_corr, x0_hist[-1], x0_corr,
                     sig[i - 1], sig[i], sig[i + 1])
        x0_hist = (x0_hist + [x0_corr])[-2:]
        lam_hist = (lam_hist + [_lam(sig[i])])[-2:]
        traj.append(nxt)
        last_sample = x_corr
        pred = nxt
    return np.asarray(traj), sig


def _run_repo_unipc(steps=N, order=2, x_init=1.0, a=0.3, b=-0.2):
    import jax.numpy as jnp
    sched = FlowUniPC(SchedulerConfig(), solver_order=order)
    sched.set_timesteps(steps, shift=SHIFT)
    x = jnp.full((1, 1, 1, 1, 1), x_init, jnp.float32)
    traj = []
    for i in range(steps):
        s = float(sched.sigmas[i])
        xv = np.float64(np.asarray(x)[0, 0, 0, 0, 0])
        v = (xv - _oracle_x0(_lam(s), a, b)) / s
        x = sched.step(jnp.full(x.shape, v, jnp.float32), i, x)
        traj.append(float(np.asarray(x)[0, 0, 0, 0, 0]))
    return np.asarray(traj), np.asarray(sched.sigmas)


def test_trajectory_matches_hand_derivation():
    """Every returned sample of the repo scheduler == the hand-written
    published recursion, float32 tolerance. Drift in any coefficient
    (phi1, B(h), rho, r_k, c_x) diverges at the first affected step."""
    hand, _ = _hand_unipc_traj()
    repo, _ = _run_repo_unipc()
    np.testing.assert_allclose(repo, hand, atol=1e-4, rtol=1e-4)


def test_constant_x0_every_step_exact():
    """Analytic invariant: constant data oracle x0 == c makes every UniPC
    step exact — the closed-form flow-ODE solution between consecutive
    sigmas is x_t = (s_t/s_s) x_s + s_t c (a_t/s_t - a_s/s_s). Wrong
    phi/B(h)/c_x coefficients break equality at the FIRST step."""
    c = 0.7
    repo, sig = _run_repo_unipc(a=c, b=0.0)
    x = 1.0
    for i in range(N - 1):
        s_s, s_t = float(sig[i]), float(sig[i + 1])
        # clamp lambda exactly as the solvers do at sigma=1
        ss = min(max(s_s, 1e-6), 1 - 1e-6)
        x = (s_t / s_s) * x + s_t * c * ((1 - s_t) / s_t - (1 - ss) / ss)
        assert abs(repo[i] - x) < 5e-5, (i, repo[i], x)
    assert abs(repo[-1] - c) < 5e-5  # final step returns x0 == c


def test_hardcoded_trajectory_literals():
    """Literals computed ONCE from the float64 hand recursion (and spot-
    verified against the constant-oracle closed form) — a tripwire against
    simultaneous drift of the repo scheduler and this test's formulas.
    Config: N=5, shift=16, x_init=1, oracle x0 = 0.3 - 0.2*lambda."""
    hand, sig = _hand_unipc_traj()
    np.testing.assert_allclose(
        sig[:3], HARD_SIGMAS, rtol=2e-5)
    np.testing.assert_allclose(hand, HARD_TRAJ, atol=5e-6)
    repo, _ = _run_repo_unipc()
    np.testing.assert_allclose(repo, HARD_TRAJ, atol=1e-4, rtol=1e-4)


# computed from _hand_unipc_traj float64 (see docstring)
HARD_SIGMAS = [1.0, 0.979618, 0.941287]
HARD_TRAJ = [1.042046, 1.018712, 0.990825, 0.062096, -0.896667]
