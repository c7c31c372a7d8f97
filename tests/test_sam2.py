"""SAM2-style predictor: shape/sanity tests with random weights (no SAM2
checkpoints ship in this environment; numerics validate on conversion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.perception.sam2 import (
    TEST_TINY, Sam2Predictor, decode_masks, encode_prompts, hiera_forward,
    init_hiera, init_sam2)


@pytest.fixture(scope="module")
def sam():
    return init_sam2(jax.random.key(0), TEST_TINY)


def test_hiera_multiscale_features(sam):
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    feats = hiera_forward(sam["hiera"], TEST_TINY, x)
    # strides 4, 8, 16, 32 with channel doubling
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    assert [f.shape[-1] for f in feats] == [32, 64, 128, 256]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_prompt_and_decode_shapes(sam):
    emb = jnp.asarray(np.random.default_rng(1).random((1, 4, 4, 256)), jnp.float32)
    pe = jnp.asarray(np.random.default_rng(2).random((1, 4, 4, 256)), jnp.float32)
    boxes = jnp.asarray([[100.0, 100.0, 400.0, 300.0]])
    prompts = encode_prompts(sam, boxes, img_size=1024)
    assert prompts.shape == (1, 2, 256)
    masks, iou = decode_masks(sam, emb, pe, prompts)
    assert masks.shape == (1, 4, 16, 16)
    assert iou.shape == (1, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_predictor_end_to_end(sam):
    pred = Sam2Predictor(sam, TEST_TINY, img_size=64)
    img = (np.random.default_rng(3).random((48, 72, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    mask, iou = pred.predict(np.array([10, 10, 50, 40]))
    assert mask.shape == (48, 72)
    assert mask.dtype == bool
    assert np.isfinite(iou)


def test_point_prompts(sam):
    pts = jnp.asarray([[[0.3, 0.4], [0.6, 0.2]]]) * 1024
    labels = jnp.asarray([[1, 0]])
    prompts = encode_prompts(sam, None, points=pts, point_labels=labels,
                             img_size=1024)
    assert prompts.shape == (1, 2, 256)
