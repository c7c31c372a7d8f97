"""Normalization primitives.

Contracts from the reference: WanRMSNorm (wan_transformer3d.py:307-323) is
x * rsqrt(mean(x^2) + eps) * weight; WanLayerNorm (:326-346) always runs in
fp32 (including affine params) and casts back. Both are elementwise+reduction
ops that XLA fuses into neighbors, so they are plain jnp here; the Pallas
attention path additionally fuses the q/k RMSNorm into its prologue.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMS norm over the last axis; stats in fp32, output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """fp32 layer norm over the last axis, cast back to x.dtype
    (WanLayerNorm semantics: affine optional)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
