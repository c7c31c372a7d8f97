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


class TestClipConversion:
    """convert_clip_vision parity vs transformers CLIPVisionModel at a tiny
    config (VERDICT r2 #4), plus the open-clip packed-qkv relayout of the
    same weights."""

    def _hf_model(self):
        import pytest
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        cfg = transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14,
            hidden_act="quick_gelu", attention_dropout=0.0)
        torch.manual_seed(0)
        return transformers.CLIPVisionModel(cfg).eval()

    def test_hf_parity(self):
        import pytest
        torch = pytest.importorskip("torch")
        from versecrafter_tpu.models.clip import (
            clip_vision_forward, convert_clip_vision)

        hf = self._hf_model()
        params, cfg = convert_clip_vision(hf.state_dict(), heads=2)
        assert cfg["dim"] == 32 and cfg["depth"] == 2 and cfg["img_size"] == 56
        rng = np.random.default_rng(0)
        px = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
        with torch.no_grad():
            out = hf(torch.as_tensor(px))
            want = out.last_hidden_state.numpy()
            want_pooled = out.pooler_output.numpy()
        # HF last_hidden_state has NO final LN (post_layernorm applies to
        # the pooled CLS only)
        cfg_nopost = dict(cfg, post_norm=False)
        got = np.asarray(clip_vision_forward(
            params, cfg_nopost, jnp.asarray(px.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
        # and with post_norm on, the CLS row equals HF's pooler_output
        got_post = np.asarray(clip_vision_forward(
            params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got_post[:, 0], want_pooled,
                                   atol=2e-4, rtol=2e-4)

    def test_open_clip_layout_equivalent(self):
        """The same weights renamed into the open-clip convention (packed
        in_proj qkv, visual.* keys) must convert to the identical pytree."""
        import pytest
        torch = pytest.importorskip("torch")
        from versecrafter_tpu.models.clip import (
            clip_vision_forward, convert_clip_vision)

        hf = self._hf_model()
        sd = hf.state_dict()
        oc = {}
        p = "vision_model."
        oc["visual.conv1.weight"] = sd[p + "embeddings.patch_embedding.weight"]
        oc["visual.class_embedding"] = sd[p + "embeddings.class_embedding"]
        oc["visual.positional_embedding"] = sd[p + "embeddings.position_embedding.weight"]
        for ours, hf_name in (("ln_pre", "pre_layrnorm"),
                              ("ln_post", "post_layernorm")):
            for s in ("weight", "bias"):
                key = f"{p}{hf_name}.{s}"
                if key not in sd:
                    key = f"{p}pre_layernorm.{s}"  # transformers renamed it
                oc[f"visual.{ours}.{s}"] = sd[key]
        i = 0
        while f"{p}encoder.layers.{i}.layer_norm1.weight" in sd:
            b = f"{p}encoder.layers.{i}."
            o = f"visual.transformer.resblocks.{i}."
            for s in ("weight", "bias"):
                oc[o + f"ln_1.{s}"] = sd[b + f"layer_norm1.{s}"]
                oc[o + f"ln_2.{s}"] = sd[b + f"layer_norm2.{s}"]
                oc[o + f"attn.in_proj_{s}"] = torch.cat(
                    [sd[b + f"self_attn.q_proj.{s}"],
                     sd[b + f"self_attn.k_proj.{s}"],
                     sd[b + f"self_attn.v_proj.{s}"]], dim=0)
                oc[o + f"attn.out_proj.{s}"] = sd[b + f"self_attn.out_proj.{s}"]
                oc[o + f"mlp.c_fc.{s}"] = sd[b + f"mlp.fc1.{s}"]
                oc[o + f"mlp.c_proj.{s}"] = sd[b + f"mlp.fc2.{s}"]
            i += 1

        p_hf, cfg = convert_clip_vision(hf.state_dict(), heads=2)
        p_oc, cfg2 = convert_clip_vision(oc, heads=2)
        assert cfg == cfg2
        rng = np.random.default_rng(1)
        px = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
        a = clip_vision_forward(p_hf, cfg, px)
        b2 = clip_vision_forward(p_oc, cfg2, px)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-6)


def test_maybe_load_clip_from_model_dir(tmp_path):
    """load_versecrafter's CLIP hook: a models_clip_*.pth in the model dir
    converts into pipeline clip_params; absent -> (None, None)."""
    import pytest
    torch = pytest.importorskip("torch")
    from versecrafter_tpu.core.convert import maybe_load_clip
    from versecrafter_tpu.models.clip import clip_vision_forward

    assert maybe_load_clip(str(tmp_path)) == (None, None)

    hf = TestClipConversion()._hf_model()
    torch.save(hf.state_dict(),
               tmp_path / "models_clip_open-clip-test.pth")
    params, cfg = maybe_load_clip(str(tmp_path), dtype=jnp.float32)
    assert params is not None and cfg["dim"] == 32
    px = jnp.asarray(np.random.default_rng(0).standard_normal((1, 56, 56, 3)),
                     jnp.float32)
    out = clip_vision_forward(params, dict(cfg, heads=2), px)
    assert out.shape == (1, 17, 32) and np.isfinite(np.asarray(out)).all()


def test_pipeline_clip_image_e2e():
    """clip_image= end-to-end through a tiny i2v-style pipeline: the image
    is CLIP-encoded and routed to the DiT's img-KV cross-attention branch,
    changing the output."""
    import dataclasses
    import jax
    from tests.test_pipeline import T5_CFG, VAE_CFG, _controls, _mask
    from versecrafter_tpu.core.config import WanDiTConfig
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=32, out_dim=4, num_heads=2, num_layers=2,
                       text_len=16, geoada_layers=(), geoada_in_dim=12,
                       model_type="i2v", add_img_emb=True, img_emb_dim=32)
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(9),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    ccfg = dict(TEST_TINY)
    # img_emb_dim must match the clip tower width for the projection
    cparams = init_clip_vision(jax.random.key(3), ccfg)
    pipe = VerseCrafterPipeline(
        dit_params=params, dit_cfg=cfg,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG, clip_params=cparams, clip_cfg=ccfg,
        scheduler_name="unipc")
    kw = dict(control_videos=_controls(), mask_video=_mask(), height=8,
              width=8, num_frames=5, num_inference_steps=2,
              guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)
    img = (np.random.default_rng(4).random((40, 40, 3)) * 255).astype(np.uint8)
    with_img = pipe("x", clip_image=img, **kw)
    without = pipe("x", **kw)
    assert np.isfinite(with_img).all()
    assert np.abs(with_img - without).max() > 1e-6


def test_default_heads_for_standard_widths():
    """The no-heads-given default must produce valid head counts for the
    standard CLIP towers (d//80 broke every width not divisible by 80:
    1024 -> 12 heads -> 1024/12 reshape error)."""
    from versecrafter_tpu.models.clip import convert_clip_vision

    rng = np.random.default_rng(0)
    d, p, img = 1024, 14, 56  # ViT-L width, tiny image
    n_tok = (img // p) ** 2 + 1
    sd = {
        "visual.conv1.weight": rng.standard_normal((d, 3, p, p)).astype(np.float32),
        "visual.class_embedding": rng.standard_normal((d,)).astype(np.float32),
        "visual.positional_embedding": rng.standard_normal((n_tok, d)).astype(np.float32),
    }
    for name in ("ln_pre", "ln_post"):
        sd[f"visual.{name}.weight"] = np.ones((d,), np.float32)
        sd[f"visual.{name}.bias"] = np.zeros((d,), np.float32)
    b = "visual.transformer.resblocks.0."
    for name, shape in (("ln_1.weight", (d,)), ("ln_1.bias", (d,)),
                        ("ln_2.weight", (d,)), ("ln_2.bias", (d,)),
                        ("attn.in_proj_weight", (3 * d, d)),
                        ("attn.in_proj_bias", (3 * d,)),
                        ("attn.out_proj.weight", (d, d)),
                        ("attn.out_proj.bias", (d,)),
                        ("mlp.c_fc.weight", (4 * d, d)),
                        ("mlp.c_fc.bias", (4 * d,)),
                        ("mlp.c_proj.weight", (d, 4 * d)),
                        ("mlp.c_proj.bias", (d,))):
        sd[b + name] = (rng.standard_normal(shape) * 0.02).astype(np.float32)

    params, cfg = convert_clip_vision(sd)
    assert cfg["heads"] == 16 and cfg["dim"] % cfg["heads"] == 0
    from versecrafter_tpu.models.clip import clip_vision_forward
    px = jnp.asarray(rng.standard_normal((1, img, img, 3)), jnp.float32)
    out = clip_vision_forward(params, cfg, px)
    assert out.shape == (1, n_tok, d) and np.isfinite(np.asarray(out)).all()
