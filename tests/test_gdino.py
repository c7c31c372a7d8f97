"""GroundingDINO-style detector: shape/sanity tests with random weights,
plus an exactness test for the deformable-attention bilinear sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.perception.gdino import (
    TEST_TINY, _init_deform, deformable_attention, gdino_forward, init_gdino,
    init_swin, swin_forward, init_text_encoder, text_forward)


def test_swin_multiscale():
    params = init_swin(jax.random.key(0), TEST_TINY)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    feats = swin_forward(params, TEST_TINY, x)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [16, 32, 64, 128]


def test_text_encoder_masks_padding():
    params = init_text_encoder(jax.random.key(1), vocab=100, dim=32, layers=1)
    ids = jnp.asarray([[5, 6, 7, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 0, 0]])
    out = text_forward(params, ids, mask, heads=4)
    assert out.shape == (1, 5, 32)
    np.testing.assert_array_equal(np.asarray(out[0, 3:]), 0.0)


def test_deformable_attention_samples_bilinearly():
    """With identity value proj, a single level, uniform weights and zero
    offsets, the output must equal the bilinear sample at the ref point."""
    d, heads, n_points = 8, 1, 2
    p = _init_deform(jax.random.key(2), d, jnp.float32, heads=heads,
                     levels=1, n_points=n_points)
    p["value"]["kernel"] = jnp.eye(d)
    p["value"]["bias"] = jnp.zeros(d)
    p["out"]["kernel"] = jnp.eye(d)
    p["out"]["bias"] = jnp.zeros(d)
    p["offsets"]["kernel"] = jnp.zeros_like(p["offsets"]["kernel"])
    p["offsets"]["bias"] = jnp.zeros_like(p["offsets"]["bias"])
    p["weights"]["kernel"] = jnp.zeros_like(p["weights"]["kernel"])
    p["weights"]["bias"] = jnp.zeros_like(p["weights"]["bias"])

    h, w = 4, 4
    value = jnp.asarray(np.random.default_rng(3).random((1, h * w, d)), jnp.float32)
    q = jnp.zeros((1, 1, d))
    # ref at the center of pixel (1, 2): x = (2+0.5)/4, y = (1+0.5)/4
    ref = jnp.asarray([[[2.5 / 4, 1.5 / 4]]])
    out = deformable_attention(p, q, ref, value, [(h, w)], heads=heads,
                               n_points=n_points)
    want = np.asarray(value[0, 1 * w + 2])
    np.testing.assert_allclose(np.asarray(out[0, 0]), want, rtol=1e-5, atol=1e-5)


def test_gdino_end_to_end_shapes():
    params = init_gdino(jax.random.key(4), TEST_TINY, d=32,
                        enhancer_layers=1, decoder_layers=1, num_queries=10)
    img = jnp.asarray(np.random.default_rng(5).random((1, 64, 64, 3)), jnp.float32)
    ids = jnp.asarray([[4, 9, 17, 0]])
    mask = jnp.asarray([[1, 1, 1, 0]])
    boxes, logits = gdino_forward(params, TEST_TINY, img, ids, mask,
                                  num_queries=10)
    assert boxes.shape == (1, 10, 4)
    assert logits.shape == (1, 10, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()
    # padded text tokens masked out of the logits
    assert (np.asarray(logits[..., 3]) < -1e8).all()
    assert np.isfinite(np.asarray(logits[..., :3])).all()
