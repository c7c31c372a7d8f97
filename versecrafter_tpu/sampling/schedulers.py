"""Flow-matching samplers: Euler, UniPC, and DPM-Solver++ multistep.

Behavioral contract from the reference, which consumes
`FlowMatchEulerDiscreteScheduler` (diffusers), `FlowUniPCMultistepScheduler`
and `FlowDPMSolverMultistepScheduler` (videox_fun.utils.fm_solvers*, chosen
at /root/reference/inference/versecrafter_inference.py:252-261 and called
from the pipeline denoise loop, pipeline_wan_versecrafter.py:746-755, 909):

- flow-matching parameterization: x_sigma = (1-sigma) * x0 + sigma * eps,
  the model predicts the velocity v = eps - x0, so x0 = x - sigma * v;
- sigma schedule: linspace(1, 1/T, N+1) warped by the timestep shift
  sigma' = shift*sigma / (1 + (shift-1)*sigma)  (shift=16 for Wan video);
- timesteps handed to the DiT are sigma * num_train_timesteps.

The solvers are written from the UniPC / DPM-Solver++ papers' update rules in
the (alpha = 1-sigma, lambda = log(alpha/sigma)) parameterization, with the
B(h)=expm1(h) ("bh2") variant for UniPC and the multistep midpoint rule for
DPM++ 2M. All carry O(order) history; state lives in the object, math is jnp
(device-resident, tiny), and the step index is a host int — the denoise loop
is a python loop around a jitted model step.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.config import SchedulerConfig


def shifted_sigmas(num_steps: int, shift: float, num_train_timesteps: int = 1000,
                   final_zero: bool = True) -> np.ndarray:
    """sigma_0..sigma_N (N+1 values, last one 0): linspace warped by shift."""
    sig = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps, dtype=np.float64)
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    if final_zero:
        sig = np.append(sig, 0.0)
    return sig.astype(np.float32)


class _FlowSchedulerBase:
    order = 1  # diffusers-compat: outer loops count steps with .order

    def __init__(self, cfg: Optional[SchedulerConfig] = None):
        self.cfg = cfg or SchedulerConfig()
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None

    def set_timesteps(self, num_inference_steps: int, shift: Optional[float] = None):
        shift = self.cfg.shift if shift is None else shift
        self.num_inference_steps = num_inference_steps
        self.sigmas = shifted_sigmas(
            num_inference_steps, shift, self.cfg.num_train_timesteps)
        self.timesteps = (self.sigmas[:-1] * self.cfg.num_train_timesteps)
        self._reset_state()
        return self.timesteps

    def set_custom_timesteps(self, timesteps):
        """Custom timestep schedule (the diffusers retrieve_timesteps
        `timesteps=` passthrough the reference exposes,
        pipeline_wan_versecrafter.py:664,746-755): sigmas follow directly as
        t / num_train_timesteps, with a final 0."""
        ts = np.asarray(list(timesteps), np.float64)
        self.num_inference_steps = len(ts)
        sig = (ts / self.cfg.num_train_timesteps).astype(np.float32)
        self.sigmas = np.append(sig, 0.0).astype(np.float32)
        self.timesteps = self.sigmas[:-1] * self.cfg.num_train_timesteps
        self._reset_state()
        return self.timesteps

    def _reset_state(self):
        pass

    # flow matching: x0 = x - sigma*v
    def _x0(self, sample, v, sigma):
        return sample - sigma * v.astype(sample.dtype)


@functools.lru_cache(maxsize=None)
def _euler_kernel():
    def f(v, x, ds):
        return (x.astype(jnp.float32)
                + ds * v.astype(jnp.float32)).astype(x.dtype)
    return jax.jit(f)


class FlowMatchEuler(_FlowSchedulerBase):
    """First-order: x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v."""

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        s0 = float(self.sigmas[step_index])
        s1 = float(self.sigmas[step_index + 1])
        return _euler_kernel()(model_output, sample, np.float32(s1 - s0))


def _lam(sigma: float) -> float:
    sigma = min(max(sigma, 1e-6), 1 - 1e-6)
    return math.log((1.0 - sigma) / sigma)


@functools.lru_cache(maxsize=None)
def _unipc_step_kernel(has_corr: bool, n_hist: int, order_p: int,
                       pred_rhos: bool, final: bool):
    """One jitted program for a whole FlowUniPC.step(): x0-prediction,
    optional UniC corrector, optional UniP predictor. Scalar coefficients
    arrive as traced f32 arrays, so the handful of structural variants
    (keyed by history length / order / corrector / final flags) compile
    once and are reused across steps AND generations. The previous eager
    version was ~20 device dispatches per step — through a remote-device
    tunnel (~0.3 s/dispatch) that dominated the denoise loop's wall clock.

    Returns (new_sample, x0_pred_f32, corrected_sample); the caller owns
    the history state."""
    def weighted(x, hist, m0, x0_t, c, with_rhos):
        # exactly the op order of the pre-refactor _uni_update
        x_t = c["c_x"] * x.astype(jnp.float32) - c["c_m0"] * m0
        acc = jnp.zeros_like(x_t)
        older = tuple(reversed(hist[:-1]))
        if with_rhos:
            for i in range(len(older)):
                acc = acc + c["rhos"][i] * ((older[i] - m0) / c["rks"][i])
            if x0_t is not None:  # corrector: the output at t closes the set
                acc = acc + c["rhos"][len(older)] * (x0_t - m0)
            x_t = x_t - c["c_acc"] * acc
        return x_t

    def f(v, x, last, hist, s0, cc, cp):
        s0b = s0.astype(x.dtype)
        x0 = (x - s0b * v.astype(x.dtype)).astype(jnp.float32)
        x_corr = x
        if has_corr:
            x_corr = weighted(last, hist, hist[-1], x0, cc,
                              with_rhos=True).astype(x.dtype)
            x0 = (x_corr - s0b * v.astype(x.dtype)).astype(jnp.float32)
        if final:
            return x0.astype(x.dtype), x0, x_corr
        hist_p = (tuple(hist) + (x0,))[-order_p:]
        new = weighted(x_corr, hist_p, hist_p[-1], None, cp,
                       with_rhos=pred_rhos)
        return new.astype(x.dtype), x0, x_corr

    return jax.jit(f)


class FlowUniPC(_FlowSchedulerBase):
    """UniPC predictor-corrector multistep (B(h)=expm1(h) variant) on the
    flow ODE, x0-prediction form. Corrector (UniC) runs at the start of each
    step using the freshly evaluated model output; predictor (UniP) then
    advances. `lower_order_final` ramps the order down near sigma=0."""

    def __init__(self, cfg: Optional[SchedulerConfig] = None,
                 solver_order: int = 2, lower_order_final: bool = True):
        super().__init__(cfg)
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final

    def _reset_state(self):
        self._x0_hist: List[jnp.ndarray] = []   # newest last
        self._lam_hist: List[float] = []
        self._last_sample: Optional[jnp.ndarray] = None

    @staticmethod
    def _uni_coeffs(lam_t, lam_s0, alpha_t, sigma_t, sigma_s0, hist_lam,
                    is_corrector):
        """Host-side scalar coefficients of the UniP/UniC update (Taylor
        matching conditions R rhos = b, bh2 variant). Same formulas and f64
        evaluation order as the previous in-line version — only the array
        math moved into the jitted step kernel."""
        h = lam_t - lam_s0
        hh = -h  # x0-prediction form integrates exp on the sigma side
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1  # bh2

        rks = [(lam_i - lam_s0) / h for lam_i in reversed(hist_lam[:-1])]
        d1_rks = list(rks)
        rks = rks + [1.0]
        order = len(rks)

        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        fac = 1
        for i in range(1, order + 1):
            R.append([r ** (i - 1) for r in rks])
            b.append(h_phi_k * math.factorial(i) / B_h)
            fac *= i + 1
            h_phi_k = h_phi_k / hh - 1.0 / fac

        Rm = np.asarray(R, np.float64)
        bv = np.asarray(b, np.float64)
        if is_corrector:
            rhos = np.asarray([0.5]) if order == 1 else np.linalg.solve(Rm, bv)
        else:
            # predictor drops the trailing rk=1 condition (no output at t yet)
            rhos = (np.asarray([0.5]) if order == 2 else
                    np.linalg.solve(Rm[:-1, :-1], bv[:-1])) if order > 1 else None

        out = dict(c_x=np.float32(sigma_t / sigma_s0),
                   c_m0=np.float32(alpha_t * h_phi_1),
                   c_acc=np.float32(alpha_t * B_h),
                   rks=np.asarray(d1_rks, np.float32))
        if rhos is not None:
            out["rhos"] = np.asarray(rhos, np.float32)
        return out

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        s0 = float(self.sigmas[step_index])
        s1 = float(self.sigmas[step_index + 1])
        lam_s0 = _lam(s0)
        has_corr = self._last_sample is not None
        final = s1 <= 0.0  # final step: exact first-order to sigma=0 is x0

        # ---- corrector: refine the prediction that produced `sample`,
        # using the model output just evaluated at s0 (UniC)
        cc = self._uni_coeffs(
            lam_s0, self._lam_hist[-1], 1.0 - s0, s0,
            self._prev_sigma(step_index), self._lam_hist,
            is_corrector=True) if has_corr else {}

        # the predictor sees the history AFTER append+trim — simulate
        lam_after = self._lam_hist + [lam_s0]
        if len(lam_after) > self.solver_order:
            lam_after = lam_after[1:]
        cp, order_p, pred_rhos = {}, 0, False
        if not final:
            order_p = self._this_order(step_index, len(lam_after))
            cp = self._uni_coeffs(_lam(s1), lam_s0, 1.0 - s1, s1, s0,
                                  lam_after[-order_p:], is_corrector=False)
            pred_rhos = "rhos" in cp

        fn = _unipc_step_kernel(has_corr, len(self._x0_hist), order_p,
                                pred_rhos, final)
        new, x0_pred, x_corr = fn(
            model_output, sample,
            self._last_sample if has_corr else sample,
            tuple(self._x0_hist), np.float32(s0), cc, cp)

        self._x0_hist.append(x0_pred)
        self._lam_hist.append(lam_s0)
        if len(self._x0_hist) > self.solver_order:
            self._x0_hist.pop(0)
            self._lam_hist.pop(0)
        self._last_sample = None if final else x_corr
        return new

    def _prev_sigma(self, step_index: int) -> float:
        return float(self.sigmas[step_index - 1]) if step_index > 0 else 1.0

    def _this_order(self, step_index: int, n_hist_after: int) -> int:
        o = min(self.solver_order, step_index + 1, n_hist_after + 1)
        if self.lower_order_final:
            o = min(o, self.num_inference_steps - step_index)
        return max(o, 1)


@functools.lru_cache(maxsize=None)
def _dpmpp_step_kernel(use_second: bool, final: bool):
    """One jitted program per FlowDPMpp.step() structural variant (see
    _unipc_step_kernel for why). Returns (new_sample, x0_pred_f32)."""
    def f(v, x, m1, c):
        s0b = c["s0"].astype(x.dtype)
        x0 = (x - s0b * v.astype(x.dtype)).astype(jnp.float32)
        if final:
            return x0.astype(x.dtype), x0
        xf = x.astype(jnp.float32)
        if use_second:
            D1 = (x0 - m1) / c["r0"]
            x_t = c["c_x"] * xf - c["c_d0"] * x0 - c["c_d1"] * D1
        else:
            x_t = c["c_x"] * xf - c["c_d0"] * x0
        return x_t.astype(x.dtype), x0

    return jax.jit(f)


class FlowDPMpp(_FlowSchedulerBase):
    """DPM-Solver++ 2M (multistep, x0-prediction) on the flow ODE."""

    def __init__(self, cfg: Optional[SchedulerConfig] = None,
                 solver_order: int = 2, lower_order_final: bool = True):
        super().__init__(cfg)
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final

    def _reset_state(self):
        self._x0_hist: List[jnp.ndarray] = []
        self._lam_hist: List[float] = []

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        s0 = float(self.sigmas[step_index])
        s1 = float(self.sigmas[step_index + 1])
        final = s1 <= 0.0
        use_second = False
        coeffs = {"s0": np.float32(s0)}
        if not final:
            lam_t, lam_s0 = _lam(s1), _lam(s0)
            alpha_t, sigma_t, sigma_s0 = 1.0 - s1, s1, s0
            h = lam_t - lam_s0
            # history length AFTER the in-kernel append
            n_after = min(len(self._x0_hist) + 1, self.solver_order)
            use_second = (
                n_after >= 2 and self.solver_order >= 2
                and not (self.lower_order_final
                         and step_index >= self.num_inference_steps - 1)
            )
            phi = math.expm1(-h)
            coeffs.update(c_x=np.float32(sigma_t / sigma_s0),
                          c_d0=np.float32(alpha_t * phi))
            if use_second:
                h_0 = lam_s0 - self._lam_hist[-1]
                r0 = h_0 / h
                coeffs["r0"] = np.float32(r0)
                coeffs["c_d1"] = np.float32(0.5 * alpha_t * phi)

        fn = _dpmpp_step_kernel(use_second, final)
        m1 = self._x0_hist[-1] if use_second else sample  # placeholder arg
        new, x0_pred = fn(model_output, sample, m1, coeffs)

        self._x0_hist.append(x0_pred)
        self._lam_hist.append(_lam(s0))
        if len(self._x0_hist) > self.solver_order:
            self._x0_hist.pop(0)
            self._lam_hist.pop(0)
        return new


def make_scheduler(name: str, cfg: Optional[SchedulerConfig] = None):
    """Names follow the reference's sampler_name choices
    (versecrafter_inference.py:134-138)."""
    name = name.lower()
    if name in ("flow", "euler"):
        return FlowMatchEuler(cfg)
    if name in ("flow_unipc", "unipc"):
        return FlowUniPC(cfg)
    if name in ("flow_dpm++", "dpm++", "dpm"):
        return FlowDPMpp(cfg)
    raise ValueError(f"unknown scheduler {name!r}")
