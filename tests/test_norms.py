import numpy as np
import jax.numpy as jnp

from versecrafter_tpu.kernels.norms import layer_norm, rms_norm


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    eps = 1e-5
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    eps = 1e-6
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + eps) * w + b
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_no_affine_bf16_runs_fp32():
    # bf16 input with large mean: fp32 internals keep the result centered
    x = (jnp.ones((1, 4, 64), jnp.bfloat16) * 300.0) + jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 4, 64)), jnp.bfloat16
    )
    y = layer_norm(x)
    assert y.dtype == jnp.bfloat16
    assert abs(float(jnp.mean(y.astype(jnp.float32)))) < 0.05
