"""DINOv2 backbone parity vs HuggingFace Dinov2Model (converted weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from versecrafter_tpu.perception.dinov2 import (
    TEST_TINY, convert_hf_dinov2, dinov2_forward)


def test_dinov2_parity():
    cfg = transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=70,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.Dinov2Model(cfg).eval()
    params = convert_hf_dinov2(hf.state_dict(), TEST_TINY)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 70, 70)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.as_tensor(px)).last_hidden_state.numpy()
    got = np.asarray(dinov2_forward(params, TEST_TINY, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_dinov2_taps():
    cfg = transformers.Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=70)
    torch.manual_seed(1)
    hf = transformers.Dinov2Model(cfg).eval()
    params = convert_hf_dinov2(hf.state_dict(), TEST_TINY)
    px = jnp.asarray(np.random.default_rng(1).random((1, 3, 70, 70)), jnp.float32)
    out, taps = dinov2_forward(params, TEST_TINY, px, out_layers=(0, 1))
    assert len(taps) == 2
    assert out.shape == (1, 1 + 25, 32)
