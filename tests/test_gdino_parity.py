"""GroundingDino port parity vs HuggingFace (random tiny config, converted
weights): backbone features, text features, and final detection outputs."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from versecrafter_tpu.perception.gdino_hf import (
    convert_hf_gdino, gdino_forward, swin_forward, text_masks_and_positions)

CFG = dict(
    d_model=32, enc_heads=4, dec_heads=4, fusion_heads=2,
    enc_points=4, dec_points=4, num_queries=10, max_text_len=16,
    pos_temperature=20.0,
    swin_patch=4, swin_window=2, swin_heads=(1, 2, 2), swin_out_stages=(0, 1, 2),
    bert_heads=2,
)


@pytest.fixture(scope="module")
def hf_model():
    swin = transformers.SwinConfig(
        image_size=64, patch_size=4, embed_dim=16, depths=[1, 2, 1],
        num_heads=[1, 2, 2], window_size=2, out_indices=[1, 2, 3],
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    bert = transformers.BertConfig(
        vocab_size=2000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    cfg = transformers.GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=32,
        encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=10, num_feature_levels=4, max_text_len=16,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        fusion_dropout=0.0, fusion_droppath=0.0, text_enhancer_dropout=0.0,
        positional_embedding_temperature=20)
    torch.manual_seed(0)
    return transformers.GroundingDinoForObjectDetection(cfg).eval()


@pytest.fixture(scope="module")
def jparams(hf_model):
    return convert_hf_gdino(hf_model.state_dict(), CFG)


def _text():
    # "[CLS] a cat . a remote . [SEP]"-like: CLS=101, SEP=102, '.'=1012
    # (word ids kept inside the tiny test vocab)
    ids = np.array([[101, 137, 493, 1012, 137, 655, 1012, 102]], np.int64)
    return ids


def test_swin_backbone_parity(hf_model, jparams):
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats, _ = hf_model.model.backbone(
            torch.as_tensor(px),
            torch.ones((1, 64, 64), dtype=torch.long))
    got = swin_forward(jparams["swin"], CFG, jnp.asarray(px))
    assert len(got) == len(feats)
    for g, (f, _) in zip(got, feats):
        np.testing.assert_allclose(np.asarray(g), f.numpy(), rtol=2e-3, atol=2e-4)


def test_text_mask_generation(hf_model):
    import transformers.models.grounding_dino.modeling_grounding_dino as m
    ids = _text()
    want_mask, want_pos = m.generate_masks_with_special_tokens_and_transfer_map(
        torch.as_tensor(ids))
    got_mask, got_pos = text_masks_and_positions(ids)
    np.testing.assert_array_equal(got_mask, want_mask.numpy())
    np.testing.assert_array_equal(got_pos, want_pos.numpy())


def test_full_detection_parity(hf_model, jparams):
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ids = _text()
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px),
                       input_ids=torch.as_tensor(ids))
    want_logits = out.logits.numpy()
    want_boxes = out.pred_boxes.numpy()

    logits, boxes = gdino_forward(jparams, CFG, jnp.asarray(px), ids)
    got_logits = np.asarray(logits)
    got_boxes = np.asarray(boxes)

    L = ids.shape[1]
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(got_logits[..., :L], want_logits[..., :L],
                               rtol=5e-3, atol=5e-3)
    # padded text positions are -inf in both
    assert np.isneginf(got_logits[..., L:]).all()


def test_bf16_detection_envelope(hf_model, jparams):
    """The bf16 fast path (convert dtype=bf16; gdino_forward casts pixels to
    the weight dtype) must track the f32 detections closely: sampling
    locations, softmaxes and the box sigmoid/logit recursion stay fp32, so
    only matmul/gather operands are rounded."""
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ids = _text()
    ref_logits, ref_boxes = gdino_forward(jparams, CFG, jnp.asarray(px), ids)
    bparams = convert_hf_gdino(hf_model.state_dict(), CFG,
                               dtype=jnp.bfloat16)
    logits, boxes = gdino_forward(bparams, CFG, jnp.asarray(px), ids)
    assert np.asarray(boxes).dtype == np.float32  # box math stayed fp32
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               atol=0.06)
    L = ids.shape[1]
    np.testing.assert_allclose(
        np.asarray(logits[..., :L]).astype(np.float32),
        np.asarray(ref_logits[..., :L]).astype(np.float32), atol=1.5)
    assert np.isneginf(np.asarray(logits)[..., L:]).all()
