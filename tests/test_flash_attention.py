"""Flash attention kernel vs. the XLA reference (run in Pallas interpret
mode on the CPU test mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from versecrafter_tpu.kernels.flash_attention import (
    attention_reference,
    flash_attention,
)


def _rand(shape, seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


def test_reference_matches_naive_softmax():
    q = jnp.asarray(_rand((1, 2, 8, 16), 0))
    k = jnp.asarray(_rand((1, 2, 8, 16), 1))
    v = jnp.asarray(_rand((1, 2, 8, 16), 2))
    out = np.asarray(attention_reference(q, k, v))
    s = np.einsum("bnqd,bnkd->bnqk", np.asarray(q), np.asarray(k)) / np.sqrt(16)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bnqk,bnkd->bnqd", p, np.asarray(v))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sq,skv", [(128, 128), (256, 384), (130, 200)])
def test_pallas_matches_reference(sq, skv):
    q = jnp.asarray(_rand((2, 2, sq, 128), 3))
    k = jnp.asarray(_rand((2, 2, skv, 128), 4))
    v = jnp.asarray(_rand((2, 2, skv, 128), 5))
    got = np.asarray(flash_attention(q, k, v, impl="pallas", block_q=128, block_kv=128))
    want = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_k_lens_masking():
    q = jnp.asarray(_rand((2, 1, 128, 128), 6))
    k = jnp.asarray(_rand((2, 1, 256, 128), 7))
    v = jnp.asarray(_rand((2, 1, 256, 128), 8))
    k_lens = jnp.asarray([100, 256], jnp.int32)
    got = np.asarray(
        flash_attention(q, k, v, k_lens=k_lens, impl="pallas", block_q=128, block_kv=128)
    )
    want = np.asarray(attention_reference(q, k, v, k_lens=k_lens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # batch 0 must equal attention over only the first 100 kv positions
    want_trunc = np.asarray(
        attention_reference(q[:1], k[:1, :, :100], v[:1, :, :100])
    )
    np.testing.assert_allclose(got[:1], want_trunc, rtol=2e-4, atol=2e-4)


def test_bf16_inputs():
    q = jnp.asarray(_rand((1, 1, 128, 128), 9), jnp.bfloat16)
    k = jnp.asarray(_rand((1, 1, 128, 128), 10), jnp.bfloat16)
    v = jnp.asarray(_rand((1, 1, 128, 128), 11), jnp.bfloat16)
    got = flash_attention(q, k, v, impl="pallas", block_q=128, block_kv=128)
    assert got.dtype == jnp.bfloat16
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=3e-2, atol=3e-2
    )
