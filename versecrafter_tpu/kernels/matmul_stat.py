"""Linear projection with a fused row-RMS statistic epilogue.

The qk-RMSNorm row statistic over the full model dim ([B, S, D] bf16 ->
[B, S, 1] fp32 rsqrt of the row mean-square) is stuck at ~100 GB/s as a
standalone pass on the v5e no matter how it is computed (XLA reduce, matvec
against ones, dedicated Pallas row kernels — all measured ~2-3 ms/call),
which costs ~190 ms per CFG-2 denoise step across the ~90 q/k statistics of
a 30-block forward. The only way past that wall is to never re-read the
projection output from HBM: this kernel emits the statistic as an epilogue
of the q/k projection matmul itself, while the output tile is still in
VMEM.

Numerics: the statistic is computed from the ROUNDED (x.dtype) projection
output — exactly the tensor the separate rms_norm pass reads
(kernels/norms.py:19-23) — so fused-vs-unfused parity is limited only by
fp32 reduce ordering. Under jax.grad the whole op falls back to plain XLA
math (same contract as the fused attention kernels: the Pallas primal is
inference-only).

Reference: the statistic feeds WanRMSNorm (wan_transformer3d.py:307-323)
as applied to the WanSelfAttention / WanCrossAttention q/k projections
(wan_transformer3d.py:370-436).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block cap: x tile [BM, 1536] bf16 + y tile fp32 in flight + bf16 out
# tile stay well inside VMEM with double buffering at 2560 rows.
BM_CAP = 2560


def _pick_bm(m: int) -> int:
    """Largest row block <= BM_CAP that divides m — preferring multiples of
    16 (exact bf16 sublane tiles), falling back to multiples of 8 (CFG-1
    row counts like 32,760 = 8*4095 have no 16-multiple divisor); 0 when
    neither exists (caller pads + slices)."""
    for step in (16, 8):
        for bm in range(min(BM_CAP, m) // step * step, step - 1, -step):
            if m % bm == 0 and (step == 16 or bm % 16 != 0):
                return bm
    return 0


def _mm_rstat_kernel(x_ref, w_ref, b_ref, y_ref, rs_ref, *, eps: float,
                     n_logical: int):
    y32 = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.float32)
    if b_ref is not None:
        # bias is added at fp32 BEFORE the single rounding to the output
        # dtype. This is what TPU XLA emits for the unfused
        # `jnp.dot(x, w) + bias` under jit (convert-elision keeps the dot's
        # f32 accumulator through the add — the CLAUDE.md numerics gotcha);
        # a round-then-add kernel measured 0.031 max-abs (~1% rel) against
        # the unfused path at the 32,760-token point on real silicon, all
        # of it bias-rounding order amplified through attention.
        y32 = y32 + b_ref[...].astype(jnp.float32)
    y_ref[...] = y32.astype(y_ref.dtype)
    # read the STORED tile back so the statistic sees the materialized
    # rounded values (an extended-precision bias-add intermediate would
    # otherwise flow into the square-sum and drift from rms_norm's input)
    yf = y_ref[...].astype(jnp.float32)
    rs_ref[...] = jax.lax.rsqrt(
        jnp.sum(yf * yf, axis=-1, keepdims=True) / n_logical + eps)


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret"))
def _linear_rstat_pallas(x2d, w, bias, eps: float, interpret: bool):
    m, k = x2d.shape
    n = w.shape[-1]
    bm = _pick_bm(m)
    pad = 0
    if bm == 0:
        bm = min(BM_CAP, ((m + 15) // 16) * 16)
        pad = -m % bm
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        m += pad

    in_specs = [
        pl.BlockSpec((bm, k), lambda i: (i, 0)),
        pl.BlockSpec((k, n), lambda i: (0, 0)),
    ]
    inputs = [x2d, w]
    if bias is not None:
        kernel = functools.partial(_mm_rstat_kernel, eps=eps, n_logical=n)
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0)))
        inputs.append(bias.reshape(1, n))
    else:
        def kernel(x_ref, w_ref, y_ref, rs_ref):
            _mm_rstat_kernel(x_ref, w_ref, None, y_ref, rs_ref, eps=eps,
                             n_logical=n)

    y, rs = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), x2d.dtype),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + m * n) * x2d.dtype.itemsize
            + m * 4,
            transcendentals=m,  # the per-row rsqrt epilogue
        ),
        interpret=interpret,
    )(*inputs)
    if pad:
        y = y[: m - pad]
        rs = rs[: m - pad]
    return y, rs


def _linear_rstat_ref(x, w, bias, eps: float):
    """Plain-XLA reference math (also the jax.grad path): f32 accumulate
    through the bias add, ONE rounding to x.dtype — the same numerics TPU
    XLA emits for wan_dit._linear's fused dot+bias under jit — followed by
    the rms_norm row statistic of the rounded output."""
    y32 = jnp.dot(x, w.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        y32 = y32 + bias.astype(jnp.float32)
    y = y32.astype(x.dtype)
    yf = y.astype(jnp.float32)
    rs = jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + eps)
    return y, rs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _linear_rstat_diff(x, w, bias, eps: float, interpret: bool):
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    if jax.default_backend() == "tpu" or interpret:
        y, rs = _linear_rstat_pallas(x2d, w.astype(x.dtype), bias, eps,
                                     interpret)
    else:
        y, rs = _linear_rstat_ref(x2d, w, bias, eps)
    return y.reshape(*lead, -1), rs.reshape(*lead, 1)


def _linear_rstat_fwd(x, w, bias, eps, interpret):
    if bias is None:
        out, vjp = jax.vjp(
            lambda x, w: _linear_rstat_ref(x, w, None, eps), x, w)
        return out, (vjp, True)
    out, vjp = jax.vjp(lambda x, w, b: _linear_rstat_ref(x, w, b, eps),
                       x, w, bias)
    return out, (vjp, False)


def _linear_rstat_bwd(eps, interpret, res, cts):
    vjp, no_bias = res
    if no_bias:
        dx, dw = vjp(cts)
        return dx, dw, None
    return vjp(cts)


_linear_rstat_diff.defvjp(_linear_rstat_fwd, _linear_rstat_bwd)


def linear_rstat(p, x: jnp.ndarray, eps: float = 1e-6,
                 interpret: bool = False):
    """Apply the dense layer `p` ({"kernel": [K, N], "bias"?: [N]}) to
    x [..., K] and ALSO return the row-RMS statistic of the output
    (rsqrt(mean(y^2, -1) + eps), [..., 1] fp32) — computed in the matmul
    epilogue on TPU so the output is never re-read from HBM. Off-TPU the
    plain-XLA reference math runs (interpret=True forces the Pallas kernel
    in interpret mode for kernel tests).

    Only for plain array kernels (quantized dict leaves keep the separate
    passes). Differentiable; under jax.grad the plain-XLA math runs."""
    return _linear_rstat_diff(x, p["kernel"], p.get("bias"), float(eps),
                              interpret)
