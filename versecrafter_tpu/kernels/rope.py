"""3D-factorized rotary position embedding for video DiT tokens.

Behavioral contract from the reference (/root/reference/versecrafter/models/
wan_transformer3d.py:52-178): the head dim d splits into a temporal part of
d - 4*(d//6) dims and two spatial parts of 2*(d//6) dims each; rotation acts
on adjacent channel pairs (complex interleaved) in fp32; RIFLEx replaces the
k-th intrinsic temporal frequency for length extrapolation
(wan_transformer3d.py:103-111).

TPU-first design: no per-sample Python loop and no complex dtype — the
(f, h, w) grid expands to dense fp32 cos/sin tables of shape [S, d/2] once
per resolution bucket, and `apply_rope` is a pure vectorized pairwise
rotation that XLA fuses into the surrounding attention ops (the Pallas
attention kernel can also consume the same tables directly).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_dim_split(head_dim: int) -> Tuple[int, int, int]:
    """(temporal, height, width) channel counts; matches the reference's
    freqs construction at wan_transformer3d.py:788-795."""
    assert head_dim % 2 == 0
    s = 2 * (head_dim // 6)
    t = head_dim - 2 * s
    return t, s, s


def rope_axis_angles(
    max_pos: int,
    dim: int,
    theta: float = 10000.0,
    riflex_k: Optional[int] = None,
    riflex_L_test: Optional[int] = None,
    riflex_L_test_scale: Optional[float] = None,
) -> np.ndarray:
    """Angle table for one axis: outer(pos, theta^(-2i/dim)) -> [max_pos, dim/2].

    Computed in float64 on host (matches the reference's fp64 freq setup) and
    returned as float32. RIFLEx: overwrite freq index k-1 with
    0.9*2*pi/L_test (optionally / L_test_scale)."""
    assert dim % 2 == 0
    inv_freq = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    if riflex_k is not None:
        f = 0.9 * 2.0 * np.pi / float(riflex_L_test)
        if riflex_L_test_scale is not None:
            f = f / float(riflex_L_test_scale)
        inv_freq[riflex_k - 1] = f
    angles = np.outer(np.arange(max_pos, dtype=np.float64), inv_freq)
    return angles.astype(np.float32)


def rope_3d_angles(
    head_dim: int,
    max_pos: int = 1024,
    theta: float = 10000.0,
    riflex_k: Optional[int] = None,
    riflex_L_test: Optional[int] = None,
    riflex_L_test_scale: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis angle tables (t, h, w), each [max_pos, n_axis_freqs].

    RIFLEx applies only to the temporal table (enable_riflex,
    wan_transformer3d.py:873-888)."""
    dt, dh, dw = rope_dim_split(head_dim)
    t = rope_axis_angles(max_pos, dt, theta, riflex_k, riflex_L_test, riflex_L_test_scale)
    h = rope_axis_angles(max_pos, dh, theta)
    w = rope_axis_angles(max_pos, dw, theta)
    return t, h, w


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def grid_cos_sin(angles: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                 f: int, h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand per-axis angle tables over an (f, h, w) token grid.

    Returns (cos, sin), each [f*h*w, head_dim//2] fp32, ordered like the
    flattened patch grid (t-major, then h, then w) — the same layout the
    reference builds at wan_transformer3d.py:159-164."""
    at, ah, aw = angles
    ang = jnp.concatenate(
        [
            jnp.broadcast_to(at[:f, None, None, :], (f, h, w, at.shape[1])),
            jnp.broadcast_to(ah[None, :h, None, :], (f, h, w, ah.shape[1])),
            jnp.broadcast_to(aw[None, None, :w, :], (f, h, w, aw.shape[1])),
        ],
        axis=-1,
    ).reshape(f * h * w, -1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent channel pairs of x by the per-position angles.

    x: [..., S, N, D] (any leading dims; S must match cos/sin row count or be
    a sharded slice thereof — pass pre-sliced tables under shard_map).
    cos/sin: [S, D/2] fp32 half-width tables, or [S, D] interleaved
    full-width tables (from interleave_rope_tables — the fast path: the
    rotation becomes y = x*cosI + pairswap(x)*sinI, two fused multiplies
    instead of pair de-interleave/re-interleave reshapes).

    Matches the reference's complex multiply x * e^{i\theta} on interleaved
    pairs (rope_apply, wan_transformer3d.py:143-172): for pair (a, b):
    (a', b') = (a cos - b sin, a sin + b cos). Math in fp32, result cast back.
    """
    orig_dtype = x.dtype
    *lead, s, n, d = x.shape
    if cos.shape[-1] == d:  # interleaved full-width tables
        xf = x.astype(jnp.float32)
        xp = xf.reshape(*lead, s, n, d // 2, 2)
        swapped = jnp.flip(xp, axis=-1).reshape(*lead, s, n, d)
        out = xf * cos[:, None, :] + swapped * sin[:, None, :]
        return out.astype(orig_dtype)
    xf = x.astype(jnp.float32).reshape(*lead, s, n, d // 2, 2)
    a, b = xf[..., 0], xf[..., 1]
    c = cos[:, None, :]  # [S, 1, D/2] broadcasts over heads
    si = sin[:, None, :]
    ra = a * c - b * si
    rb = a * si + b * c
    out = jnp.stack([ra, rb], axis=-1).reshape(*lead, s, n, d)
    return out.astype(orig_dtype)


def interleave_rope_tables(cos: jnp.ndarray, sin: jnp.ndarray):
    """[S, D/2] -> ([S, D], [S, D]) for the fused apply_rope path:
    cosI[2i] = cosI[2i+1] = cos_i; sinI[2i] = -sin_i, sinI[2i+1] = +sin_i
    (so y_even = a*cos - b*sin and y_odd = b*cos + a*sin with one pairswap)."""
    s, h = cos.shape
    cosI = jnp.repeat(cos, 2, axis=-1)
    sgn = jnp.tile(jnp.asarray([-1.0, 1.0], cos.dtype), (h,))
    sinI = jnp.repeat(sin, 2, axis=-1) * sgn[None, :]
    return cosI, sinI
