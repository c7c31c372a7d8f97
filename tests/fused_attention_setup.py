"""Shared builders for fused-attention kernel tests (one place to update
when the kernel input contract changes)."""

import jax
import jax.numpy as jnp
import numpy as np


def fused_attention_inputs(B=2, S=520, N=4, HD=64, seed=0):
    """Raw q/k/v projections, rope tables for a 10x4x13 grid (520 rows),
    and qk-norm scales — the fused_rope_rms_attention input contract."""
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    D = N * HD
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    gk = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    ang = rope_3d_angles(HD, max_pos=64)
    cos, sin = grid_cos_sin(tuple(jnp.asarray(a) for a in ang), 10, 4, 13)
    return q, k, v, cos, sin, gq, gk, N, HD


def tiny_wan_setup(seed=0):
    """Tiny WanDiT config + randomized-head params + a forward-input tuple
    (the zero-init production head makes fresh-init outputs CONSTANT — any
    two attention paths would diff to a vacuous 0.0)."""
    from versecrafter_tpu.core.config import WanDiTConfig
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit

    cfg = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32,
                       text_dim=24, out_dim=4, num_heads=4, num_layers=2,
                       text_len=8)
    params = init_wan_dit(jax.random.key(seed), cfg, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(seed + 1),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    rng = np.random.default_rng(seed + 2)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 24)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(12, max_pos=32))
    cos, sin = grid_cos_sin(ang, 2, 4, 4)
    t = jnp.asarray([500.0])
    return cfg, params, (x, t, ctx, cos, sin)
