import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.models.clip import (
    TEST_TINY, clip_vision_forward, encode_image, init_clip_vision)


def test_clip_token_count():
    params = init_clip_vision(jax.random.key(0), TEST_TINY)
    img = jnp.asarray(np.random.default_rng(0).random((1, 56, 56, 3)), jnp.float32)
    tok = clip_vision_forward(params, TEST_TINY, img)
    assert tok.shape == (1, 1 + 16, 32)  # cls + 4x4 patches
    assert np.isfinite(np.asarray(tok)).all()


def test_encode_image_resizes_and_normalizes():
    params = init_clip_vision(jax.random.key(1), TEST_TINY)
    img = (np.random.default_rng(1).random((90, 120, 3)) * 255).astype(np.uint8)
    tok = encode_image(params, TEST_TINY, img)
    assert tok.shape == (1, 17, 32)
