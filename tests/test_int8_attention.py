"""int8 QK^T scoring inside the fused attention kernel (INT8_QK_SCORE /
fused_rope_rms_attention(int8_score=True)).

The transformed q/k tiles are quantized per row to int8 and the score tile
is an s8 x s8 -> s32 MXU dot (~2x bf16 rate on v5e), scales multiplied back
before the softmax. Inference-only approximation: the contract pinned here
is the error ENVELOPE vs the exact bf16 kernel (softmax damps the ~1/127
relative score noise) plus exactness of everything around it (masking,
padding, flavors, grad fallback).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np

fa = importlib.import_module("versecrafter_tpu.kernels.flash_attention")


from tests.fused_attention_setup import (fused_attention_inputs as _setup,
                                          tiny_wan_setup)


def _close(a, b, rel=0.03):
    d = float(jnp.abs(a - b).max())
    m = float(jnp.abs(b).max())
    c = float(np.corrcoef(np.asarray(a, np.float32).ravel(),
                          np.asarray(b, np.float32).ravel())[0, 1])
    assert d < rel * m and c > 0.999, (d, m, c)


def test_int8_score_streaming_envelope():
    q, k, v, cos, sin, gq, gk, N, HD = _setup()
    base = fa.fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                       num_heads=N, impl="pallas")
    got = fa.fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                      num_heads=N, impl="pallas",
                                      int8_score=True)
    _close(got, base)


def test_int8_score_resident_and_blocked_tables():
    q, k, v, cos, sin, gq, gk, N, HD = _setup()
    ci, si = fa.prepare_fused_rope_tables(cos, sin)
    rq = jax.lax.rsqrt(jnp.mean(q * q, -1, keepdims=True) + 1e-6)
    rk = jax.lax.rsqrt(jnp.mean(k * k, -1, keepdims=True) + 1e-6)
    scale_q = HD ** -0.5 * fa.LOG2E
    kw = dict(head_dim=HD, block_q=128, block_kv=128, interpret=True,
              masked=True, window=(-1, -1))
    base = fa._flash_attention_fused_pallas(
        q, k, v, jnp.full((2,), q.shape[1], jnp.int32), rq * scale_q, rk,
        ci, si, gq.reshape(N, 1, HD), gk.reshape(N, 1, HD),
        resident_kv=True, **kw)
    for blocked in (False, True):
        got = fa._flash_attention_fused_pallas(
            q, k, v, jnp.full((2,), q.shape[1], jnp.int32), rq * scale_q,
            rk, ci, si, gq.reshape(N, 1, HD), gk.reshape(N, 1, HD),
            resident_kv=True, blocked_tables=blocked, int8_score=True, **kw)
        _close(got, base)


def test_int8_score_model_level_and_grad_fallback():
    """wan_dit forward with INT8_QK_SCORE on: within the int8 envelope of
    the exact path on the interpret kernel; under jax.grad the flag is a
    no-op (unfused exact math runs either way)."""
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.models.wan_dit import wan_dit_forward

    cfg, params, (x, t, ctx, cos, sin) = tiny_wan_setup()

    old = wan_dit.INT8_QK_SCORE
    try:
        wan_dit.INT8_QK_SCORE = False
        off = wan_dit_forward(params, cfg, x, t, ctx, cos, sin)
        wan_dit.INT8_QK_SCORE = True
        on = wan_dit_forward(params, cfg, x, t, ctx, cos, sin)
        # grad: both flags reduce to the same unfused exact math
        def loss(p):
            return jnp.sum(wan_dit_forward(p, cfg, x, t, ctx, cos, sin) ** 2)
        g_on = jax.grad(loss)(params)
        wan_dit.INT8_QK_SCORE = False
        g_off = jax.grad(loss)(params)
    finally:
        wan_dit.INT8_QK_SCORE = old
    # model-level wiring check: on the CPU mesh the auto impl resolves to
    # the exact xla path where int8_score is a documented no-op (the
    # envelope itself is pinned by the kernel-level tests above)
    c = float(np.corrcoef(np.asarray(on).ravel(),
                          np.asarray(off).ravel())[0, 1])
    assert c > 0.999, c
    ka = g_on["blocks"]["self_attn"]["q"]["kernel"]
    kb = g_off["blocks"]["self_attn"]["q"]["kernel"]
    assert float(jnp.abs(ka - kb).max()) < 1e-5
