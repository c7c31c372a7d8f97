"""umT5 encoder parity against HuggingFace transformers' UMT5EncoderModel
(random tiny model, weights converted through convert_hf_umt5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from versecrafter_tpu.core.config import T5Config
from versecrafter_tpu.models.t5 import (
    convert_hf_umt5,
    init_t5,
    relative_position_bucket,
    t5_encode,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = T5Config(vocab=120, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
               num_layers=2, num_buckets=8, rel_pos_max_distance=16,
               text_length=12)


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.UMT5Config(
        vocab_size=CFG.vocab, d_model=CFG.dim, d_kv=CFG.dim_attn // CFG.num_heads,
        d_ff=CFG.dim_ffn, num_layers=CFG.num_layers, num_heads=CFG.num_heads,
        relative_attention_num_buckets=CFG.num_buckets,
        relative_attention_max_distance=CFG.rel_pos_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0, is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    model = transformers.UMT5EncoderModel(hf_cfg).eval()
    return model


def test_bucket_function_matches_hf(hf_model):
    rel = np.arange(-40, 40).reshape(1, -1)
    got = relative_position_bucket(rel, num_buckets=8, max_distance=16)
    attn = hf_model.encoder.block[0].layer[0].SelfAttention
    want = attn._relative_position_bucket(torch.as_tensor(rel)).numpy()
    np.testing.assert_array_equal(got, want)


def test_encoder_matches_hf(hf_model):
    params = convert_hf_umt5(hf_model.state_dict(), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab, size=(2, CFG.text_length))
    mask = np.ones((2, CFG.text_length), np.int64)
    mask[0, 8:] = 0  # padded batch element

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.as_tensor(ids), attention_mask=torch.as_tensor(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(t5_encode(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    # HF does not zero padded positions; ours does — compare valid tokens
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[0, :8], want[0, :8], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got[0, 8:], 0.0)


def test_init_runs():
    import jax
    params = init_t5(jax.random.key(0), CFG)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, CFG.vocab, (1, 6)))
    out = t5_encode(params, CFG, ids)
    assert out.shape == (1, 6, CFG.dim)
    assert np.isfinite(np.asarray(out)).all()
