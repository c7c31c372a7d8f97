"""Producer-fused row-RMS statistic (kernels/matmul_stat.py) and its
consumption by the fused attention dispatchers.

The standalone qk-RMS statistic pass is bandwidth-walled on the chip
(~2 ms/call however computed — round-3 measurements); these tests pin the
replacement contract: the projection-matmul epilogue emits a statistic
bit-compatible with what rms_norm would have computed from the rounded
projection output, and the rstats-consuming attention paths match the
self-reducing ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.kernels.matmul_stat import (_linear_rstat_ref,
                                                  _pick_bm, linear_rstat)


def _mk(m, k, n, dtype=jnp.bfloat16, bias=True, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, m, k)), dtype)
    p = {"kernel": jnp.asarray(rng.standard_normal((k, n)) * 0.1, dtype)}
    if bias:
        p["bias"] = jnp.asarray(rng.standard_normal(n) * 0.1, dtype)
    return x, p


@pytest.mark.parametrize("bias", [True, False])
@pytest.mark.parametrize("m", [96, 97])  # 97: ragged pad/mask path
def test_kernel_matches_jitted_reference(m, bias):
    x, p = _mk(m, 64, 128, bias=bias)
    y_i, rs_i = linear_rstat(p, x, 1e-6, interpret=True)
    ref = jax.jit(lambda x: _linear_rstat_ref(x, p["kernel"],
                                              p.get("bias"), 1e-6))
    y_r, rs_r = ref(x)
    assert y_i.dtype == x.dtype and rs_i.dtype == jnp.float32
    assert rs_i.shape == (*x.shape[:-1], 1)
    # same math, same rounding points; only fp32 accumulation order inside
    # the dot / the row reduce may differ
    assert float(jnp.abs(y_i.astype(jnp.float32)
                         - y_r.astype(jnp.float32)).max()) < 1e-6
    assert float(jnp.abs(rs_i - rs_r).max()) < 1e-5


def test_pick_bm_divides_production_rows():
    # 480p x 81f CFG-2 (2 x 32,760 rows) and 720p (2 x 75,600 rows)
    for m in (65520, 151200, 2 * 9360):
        bm = _pick_bm(m)
        assert bm > 0 and m % bm == 0 and bm % 16 == 0 and bm <= 2560, (m, bm)
    # CFG-1 row counts have no 16-multiple divisor: 8-multiple fallback
    bm1 = _pick_bm(32760)
    assert bm1 > 0 and 32760 % bm1 == 0 and bm1 % 8 == 0, bm1
    assert _pick_bm(17 * 16 + 1) == 0  # prime-ish: pad path


def test_grad_matches_reference_math():
    x, p = _mk(64, 32, 48, dtype=jnp.float32)

    def loss_fused(p, x):
        y, rs = linear_rstat(p, x, 1e-6)
        return jnp.sum(y ** 2) + jnp.sum(rs ** 2)

    def loss_ref(p, x):
        y, rs = _linear_rstat_ref(x, p["kernel"], p["bias"], 1e-6)
        return jnp.sum(y ** 2) + jnp.sum(rs ** 2)

    gf = jax.grad(loss_fused)(p, x)
    gr = jax.grad(loss_ref)(p, x)
    for k in p:
        assert float(jnp.abs(gf[k] - gr[k]).max()) < 1e-5, k


class TestRstatsAttentionPaths:
    """fused_rope_rms_attention(rstats=...) / fused_rms_cross_attention(rq=)
    must match the self-reducing dispatch exactly (the statistic is the
    same number, merely computed in the producer)."""

    @staticmethod
    def _setup(**kw):
        from tests.fused_attention_setup import fused_attention_inputs
        return fused_attention_inputs(**kw)

    @staticmethod
    def _stats(x, eps=1e-6):
        xf = x.astype(jnp.float32)
        return jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)

    def test_self_attention_rstats_matches(self):
        from versecrafter_tpu.kernels.flash_attention import (
            fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup()
        base = fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                        num_heads=N, impl="pallas")
        got = fused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, num_heads=N, impl="pallas",
            rstats=(self._stats(q), self._stats(k)))
        assert float(jnp.max(jnp.abs(base - got))) < 1e-5
        # xla fallback consumes the stats too
        ref = fused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, num_heads=N, impl="xla",
            rstats=(self._stats(q), self._stats(k)))
        assert float(jnp.max(jnp.abs(base - ref))) < 2e-3

    def test_cross_attention_rq_matches(self):
        from versecrafter_tpu.kernels.flash_attention import (
            fused_rms_cross_attention)
        q, k, v, _, _, gq, gk, N, HD = self._setup()
        k = k[:, :128]
        v = v[:, :128]
        base = fused_rms_cross_attention(q, k, v, gq, gk, num_heads=N,
                                         impl="pallas")
        got = fused_rms_cross_attention(q, k, v, gq, gk, num_heads=N,
                                        impl="pallas", rq=self._stats(q))
        assert float(jnp.max(jnp.abs(base - got))) < 1e-5

    def test_self_attention_rstats_grad_matches(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rope_rms_attention, fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup(S=130)
        cos, sin = cos[:130], sin[:130]

        def f(q, gq):
            rstats = (self._stats(q), self._stats(k))
            return jnp.sum(fused_rope_rms_attention(
                q, k, v, cos, sin, gq, gk, num_heads=N, impl="pallas",
                rstats=rstats) ** 2)

        def u(q, gq):
            return jnp.sum(_unfused_rope_rms_attention(
                q, k, v, cos, sin, gq, gk, N, 1e-6, HD ** -0.5, (-1, -1),
                "xla") ** 2)

        gf = jax.grad(f, argnums=(0, 1))(q, gq)
        gu = jax.grad(u, argnums=(0, 1))(q, gq)
        for a, b in zip(gf, gu):
            assert float(jnp.abs(a - b).max()) < 1e-4


def test_model_level_proj_stat_fusion_parity():
    """wan_dit forward with PROJ_STAT_FUSION on vs off (CPU xla path): the
    statistic is the same number either way — outputs must match tightly.
    Head must be randomized (zero-init makes fresh-init outputs constant)."""
    from tests.fused_attention_setup import tiny_wan_setup
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.models.wan_dit import wan_dit_forward

    cfg, params, (x, t, ctx, cos, sin) = tiny_wan_setup()

    old = wan_dit.PROJ_STAT_FUSION
    try:
        wan_dit.PROJ_STAT_FUSION = True
        on = wan_dit_forward(params, cfg, x, t, ctx, cos, sin)
        wan_dit.PROJ_STAT_FUSION = False
        off = wan_dit_forward(params, cfg, x, t, ctx, cos, sin)
    finally:
        wan_dit.PROJ_STAT_FUSION = old
    assert float(jnp.abs(on - off).max()) < 1e-4
