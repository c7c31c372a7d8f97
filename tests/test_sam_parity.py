"""SAM port parity vs HuggingFace SamModel (random tiny config, converted
weights): vision embeddings, prompt tokens, and mask/IoU outputs must match
at fp32 tolerance."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from versecrafter_tpu.perception.sam import (
    convert_hf_sam, decode_masks, encode_prompts, vision_forward)

CFG = dict(hidden_size=32, depth=3, heads=2, global_layers=(1,),
           window=2, patch=8, img_size=64, out_ch=24, mlp_ratio=2.0)


@pytest.fixture(scope="module")
def hf_model():
    vision = transformers.SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        global_attn_indexes=[1], window_size=2, patch_size=8, image_size=64,
        output_channels=24, mlp_dim=64, num_pos_feats=12, use_abs_pos=True,
        use_rel_pos=True)
    prompt = transformers.SamPromptEncoderConfig(
        hidden_size=24, image_size=64, patch_size=8, image_embedding_size=8)
    decoder = transformers.SamMaskDecoderConfig(
        hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        mlp_dim=48, iou_head_depth=3, iou_head_hidden_dim=32)
    cfg = transformers.SamConfig(
        vision_config=vision, prompt_encoder_config=prompt,
        mask_decoder_config=decoder)
    torch.manual_seed(0)
    return transformers.SamModel(cfg).eval()


@pytest.fixture(scope="module")
def jparams(hf_model):
    return convert_hf_sam(hf_model.state_dict(), CFG, decoder_heads=2)


def test_vision_encoder_parity(hf_model, jparams):
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.vision_encoder(torch.as_tensor(px)).last_hidden_state.numpy()
    got = np.asarray(vision_forward(jparams, CFG,
                                    jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_full_box_prompt_parity(hf_model, jparams):
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    boxes = np.array([[[8.0, 12.0, 40.0, 52.0]]], np.float32)  # [B, Q, 4]
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px),
                       input_boxes=torch.as_tensor(boxes),
                       multimask_output=True)
    want_masks = out.pred_masks.numpy()   # [B, Q, 3, 4h, 4w]
    want_iou = out.iou_scores.numpy()

    emb = vision_forward(jparams, CFG, jnp.asarray(px.transpose(0, 2, 3, 1)))
    sparse = encode_prompts(jparams, CFG, boxes=jnp.asarray(boxes))
    masks, iou = decode_masks(jparams, CFG, emb, sparse)
    # HF returns the multimask slice [1:]
    np.testing.assert_allclose(np.asarray(iou[:, :, 1:]), want_iou,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(masks[:, :, 1:]), want_masks,
                               rtol=2e-3, atol=2e-2)


def test_point_prompt_parity(hf_model, jparams):
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    pts = np.array([[[[20.0, 30.0], [40.0, 10.0]]]], np.float32)  # [B,Q,P,2]
    labels = np.array([[[1, 0]]], np.int64)
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px),
                       input_points=torch.as_tensor(pts),
                       input_labels=torch.as_tensor(labels),
                       multimask_output=True)
    emb = vision_forward(jparams, CFG, jnp.asarray(px.transpose(0, 2, 3, 1)))
    sparse = encode_prompts(jparams, CFG, points=jnp.asarray(pts),
                            labels=jnp.asarray(labels))
    masks, iou = decode_masks(jparams, CFG, emb, sparse)
    np.testing.assert_allclose(np.asarray(iou[:, :, 1:]),
                               out.iou_scores.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(masks[:, :, 1:]),
                               out.pred_masks.numpy(), rtol=2e-3, atol=2e-2)
