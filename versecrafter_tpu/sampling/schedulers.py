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

import math
from typing import List, Optional

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


class FlowMatchEuler(_FlowSchedulerBase):
    """First-order: x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v."""

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        s0 = float(self.sigmas[step_index])
        s1 = float(self.sigmas[step_index + 1])
        return (sample.astype(jnp.float32)
                + (s1 - s0) * model_output.astype(jnp.float32)).astype(sample.dtype)


def _lam(sigma: float) -> float:
    sigma = min(max(sigma, 1e-6), 1 - 1e-6)
    return math.log((1.0 - sigma) / sigma)


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

    def _uni_update(self, x, x0_t, lam_t, lam_s0, alpha_t, sigma_t, sigma_s0,
                    hist_x0, hist_lam, corrector_m0=None):
        """Shared UniP/UniC update.

        Predictor: hist = older outputs, m0 = newest; advance s0 -> t.
        Corrector: additionally uses the model output AT t (x0_t)."""
        m0 = hist_x0[-1]
        h = lam_t - lam_s0
        hh = -h  # x0-prediction form integrates exp on the sigma side
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1  # bh2

        rks, D1s = [], []
        for mi, lam_i in zip(reversed(hist_x0[:-1]), reversed(hist_lam[:-1])):
            rk = (lam_i - lam_s0) / h
            rks.append(rk)
            D1s.append((mi.astype(jnp.float32) - m0.astype(jnp.float32)) / rk)
        is_corrector = corrector_m0 is not None
        rks.append(1.0)
        order = len(rks)

        # R rhos = b  (Taylor matching conditions)
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

        x_t = (sigma_t / sigma_s0) * x.astype(jnp.float32) \
            - alpha_t * h_phi_1 * m0.astype(jnp.float32)
        acc = jnp.zeros_like(x_t)
        if is_corrector:
            for rho, d in zip(rhos[:-1], D1s):
                acc = acc + float(rho) * d
            D1_t = x0_t.astype(jnp.float32) - m0.astype(jnp.float32)
            acc = acc + float(rhos[-1]) * D1_t
        elif rhos is not None:
            for rho, d in zip(rhos, D1s):
                acc = acc + float(rho) * d
        x_t = x_t - alpha_t * B_h * acc
        return x_t

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        s0 = float(self.sigmas[step_index])
        s1 = float(self.sigmas[step_index + 1])
        lam_s0 = _lam(s0)
        x0_pred = self._x0(sample, model_output, s0).astype(jnp.float32)

        # ---- corrector: refine the prediction that produced `sample`,
        # using the model output just evaluated at s0 (UniC)
        if self._last_sample is not None:
            sample = self._uni_update(
                self._last_sample, x0_pred, lam_s0, self._lam_hist[-1],
                1.0 - s0, s0, self._prev_sigma(step_index),
                self._x0_hist, self._lam_hist, corrector_m0=x0_pred,
            ).astype(sample.dtype)
            # x0 for the (corrected) sample
            x0_pred = self._x0(sample, model_output, s0).astype(jnp.float32)

        self._x0_hist.append(x0_pred)
        self._lam_hist.append(lam_s0)
        if len(self._x0_hist) > self.solver_order:
            self._x0_hist.pop(0)
            self._lam_hist.pop(0)

        if s1 <= 0.0:  # final step: exact first-order to sigma=0 is x0
            new = x0_pred
            self._last_sample = None
            return new.astype(sample.dtype)

        lam_s1 = _lam(s1)
        order_p = self._this_order(step_index)
        hist_x0 = self._x0_hist[-order_p:]
        hist_lam = self._lam_hist[-order_p:]
        new = self._uni_update(
            sample, None, lam_s1, lam_s0, 1.0 - s1, s1, s0,
            hist_x0, hist_lam, corrector_m0=None,
        )
        self._last_sample = sample
        return new.astype(sample.dtype)

    def _prev_sigma(self, step_index: int) -> float:
        return float(self.sigmas[step_index - 1]) if step_index > 0 else 1.0

    def _this_order(self, step_index: int) -> int:
        o = min(self.solver_order, step_index + 1, len(self._x0_hist) + 1)
        if self.lower_order_final:
            o = min(o, self.num_inference_steps - step_index)
        return max(o, 1)


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
        x0_pred = self._x0(sample, model_output, s0).astype(jnp.float32)
        self._x0_hist.append(x0_pred)
        self._lam_hist.append(_lam(s0))
        if len(self._x0_hist) > self.solver_order:
            self._x0_hist.pop(0)
            self._lam_hist.pop(0)

        if s1 <= 0.0:
            return x0_pred.astype(sample.dtype)

        lam_t, lam_s0 = _lam(s1), _lam(s0)
        alpha_t, sigma_t, sigma_s0 = 1.0 - s1, s1, s0
        h = lam_t - lam_s0
        use_second = (
            len(self._x0_hist) >= 2 and self.solver_order >= 2
            and not (self.lower_order_final and step_index >= self.num_inference_steps - 1)
        )
        x = sample.astype(jnp.float32)
        phi = math.expm1(-h)
        if use_second:
            h_0 = lam_s0 - self._lam_hist[-2]
            r0 = h_0 / h
            m0 = self._x0_hist[-1]
            m1 = self._x0_hist[-2]
            D0 = m0
            D1 = (m0 - m1) / r0
            x_t = (sigma_t / sigma_s0) * x - alpha_t * phi * D0 \
                - 0.5 * alpha_t * phi * D1
        else:
            x_t = (sigma_t / sigma_s0) * x - alpha_t * phi * x0_pred
        return x_t.astype(sample.dtype)


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
