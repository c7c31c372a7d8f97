"""SAM2 port parity vs HuggingFace Sam2Model (random tiny config, converted
weights): Hiera/FPN vision features, box-prompted masks, IoU and object
scores must match at fp32 tolerance."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from versecrafter_tpu.perception import sam2

BB = dict(hidden_size=16, num_attention_heads=1,
          image_size=[128, 128], blocks_per_stage=[1, 1, 2, 1],
          embed_dim_per_stage=[16, 32, 64, 128],
          num_attention_heads_per_stage=[1, 2, 2, 4],
          window_size_per_stage=[4, 4, 4, 4], global_attention_blocks=[3],
          num_query_pool_stages=3)


@pytest.fixture(scope="module")
def hf_model():
    vision = transformers.Sam2VisionConfig(
        backbone_config=transformers.Sam2HieraDetConfig(**BB),
        backbone_channel_list=[128, 64, 32, 16],
        backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]],
        fpn_hidden_size=32)
    prompt = transformers.Sam2PromptEncoderConfig(
        hidden_size=32, image_size=128, patch_size=16)
    decoder = transformers.Sam2MaskDecoderConfig(
        hidden_size=32, num_attention_heads=2, mlp_dim=64)
    cfg = transformers.Sam2Config(
        vision_config=vision, prompt_encoder_config=prompt,
        mask_decoder_config=decoder)
    torch.manual_seed(0)
    model = transformers.Sam2Model(cfg).eval()
    # exercise the pos-embed path with non-trivial values (init zeroes them)
    with torch.no_grad():
        model.vision_encoder.backbone.pos_embed.normal_(0, 0.5)
        model.vision_encoder.backbone.pos_embed_window.normal_(0, 0.5)
        model.no_memory_embedding.normal_(0, 0.5)
    return model


@pytest.fixture(scope="module")
def jmodel(hf_model):
    cfg = sam2.cfg_from_hf(hf_model.config)
    params = sam2.convert_hf_sam2(hf_model.state_dict(), cfg)
    return params, cfg


def test_cfg_from_hf(jmodel):
    _, cfg = jmodel
    assert cfg["embed_dims"] == (16, 32, 64, 128)
    assert cfg["global_blocks"] == (3,)
    assert cfg["num_mask_tokens"] == 4


def test_vision_embeddings_parity(hf_model, jmodel):
    params, cfg = jmodel
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.get_image_embeddings(torch.as_tensor(px))
    got = sam2.image_embeddings(params, cfg,
                                jnp.asarray(px.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("multimask", [True, False])
def test_box_prompt_parity(hf_model, jmodel, multimask):
    params, cfg = jmodel
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    boxes = np.array([[[16.0, 24.0, 80.0, 104.0],
                       [8.0, 8.0, 56.0, 48.0]]], np.float32)  # [B, Q, 4]
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px),
                       input_boxes=torch.as_tensor(boxes),
                       multimask_output=multimask)
    masks, iou, obj = sam2.predict_boxes(
        params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)),
        jnp.asarray(boxes), multimask_output=multimask)
    np.testing.assert_allclose(np.asarray(iou), out.iou_scores.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(obj),
                               out.object_score_logits.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_point_prompt_parity(hf_model, jmodel):
    params, cfg = jmodel
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    pts = np.array([[[[40.0, 60.0]]]], np.float32)  # [B, Q, P, 2]
    labels = np.array([[[1]]], np.int32)
    with torch.no_grad():
        out = hf_model(pixel_values=torch.as_tensor(px),
                       input_points=torch.as_tensor(pts),
                       input_labels=torch.as_tensor(labels),
                       multimask_output=True)
    embeds = sam2.image_embeddings(params, cfg,
                                   jnp.asarray(px.transpose(0, 2, 3, 1)))
    sparse = sam2.encode_prompts(params, cfg, points=jnp.asarray(pts),
                                 labels=jnp.asarray(labels))
    masks, iou, obj = sam2.decode_masks(params, cfg, embeds, sparse)
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               rtol=2e-3, atol=2e-3)
