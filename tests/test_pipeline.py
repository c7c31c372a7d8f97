"""End-to-end pipeline tests on tiny models (CPU mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import (
    SchedulerConfig, T5Config, VAEConfig, WanDiTConfig)
from versecrafter_tpu.models.t5 import init_t5
from versecrafter_tpu.models.vae import init_vae
from versecrafter_tpu.models.wan_dit import init_wan_dit
from versecrafter_tpu.sampling.pipeline import (
    VerseCrafterPipeline, encode_mask_pixelshuffle)

VAE_CFG = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temporal_downsample=(True,), spatial_compression_ratio=2,
                    temporal_compression_ratio=2, use_latent_stats=False)
T5_CFG = T5Config(vocab=256, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                  num_layers=2, num_buckets=8, text_length=16)
# geoada_in_dim = 4 controls x z + 64 mask ch is the real contract; for the
# tiny VAE (z=4, stride 2x2 -> 4 mask ch) we use 2 controls: 2*4 + 4 = 12
DIT_CFG = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=32, out_dim=4, num_heads=2, num_layers=4,
                       text_len=16, geoada_layers=(), geoada_in_dim=12)


def _live_dit_params():
    """init + un-zeroed output head (the reference zero-inits it, which would
    make every noise prediction a constant in these randomly-init tests)."""
    p = init_wan_dit(jax.random.key(0), DIT_CFG, jnp.float32)
    p["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(99), p["head"]["head"]["kernel"].shape) * 0.05)
    return p


@pytest.fixture(scope="module")
def pipe():
    return VerseCrafterPipeline(
        dit_params=_live_dit_params(),
        dit_cfg=DIT_CFG,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG,
        scheduler_name="unipc",
    )


def _controls(n=2, t=5, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.random((1, 3, t, h, w)).astype(np.float32) for _ in range(n)]


def _mask(t=5, h=8, w=8):
    m = np.zeros((1, 1, t, h, w), np.float32)
    m[:, :, :, 2:6, 2:6] = 1.0
    return m


def test_mask_pixelshuffle_contract():
    m = jnp.asarray(_mask(t=5, h=8, w=8))
    out = encode_mask_pixelshuffle(m, latent_t=3, vae_stride=(2, 2, 2))
    assert out.shape == (1, 4, 3, 4, 4)
    # pixel-shuffle is a pure rearrangement of 0/1 values
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def _run(pipe, seed=7, steps=4, **kw):
    return pipe(
        "a car drives left", negative_prompt="static",
        control_videos=_controls(), mask_video=_mask(),
        height=8, width=8, num_frames=5, num_inference_steps=steps,
        guidance_scale=2.0, shift=3.0, seed=seed, dtype=jnp.float32, **kw)


def test_e2e_generation(pipe):
    video = _run(pipe)
    assert video.shape == (1, 5, 8, 8, 3)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_seed_determinism(pipe):
    v1 = _run(pipe, seed=7)
    v2 = _run(pipe, seed=7)
    v3 = _run(pipe, seed=8)
    np.testing.assert_array_equal(v1, v2)
    assert np.abs(v1 - v3).max() > 1e-6


def test_latent_output(pipe):
    lat = _run(pipe, output_type="latent")
    assert lat.shape == (1, VAE_CFG.z_dim, 3, 4, 4)


def test_teacache_runs_and_skips(pipe):
    try:
        # constant-0 rescale poly + huge threshold => accumulator never
        # reaches it => every step after skip_start reuses the residual
        pipe.enable_teacache(threshold=1e30, skip_start=1, coefficients=(0.0,))
        v_cached = _run(pipe, steps=6)
        assert np.isfinite(v_cached).all()
        # constant-huge poly => accumulator always crosses => never skips
        pipe.enable_teacache(threshold=0.5, skip_start=0, coefficients=(1e9,))
        v_full = _run(pipe, steps=6)
        pipe.disable_teacache()
        v_off = _run(pipe, steps=6)
        # threshold ~0 => never skips => must match the teacache-off result
        np.testing.assert_allclose(v_full, v_off, rtol=1e-4, atol=1e-5)
        # huge threshold => skips most steps => visibly different
        assert np.abs(v_cached - v_off).max() > 1e-6
    finally:
        pipe.disable_teacache()


def test_cfg_skip_runs(pipe):
    try:
        pipe.enable_cfg_skip(0.5)
        v = _run(pipe, steps=4)
        assert np.isfinite(v).all()
        pipe.enable_cfg_skip(0.0)
        v0 = _run(pipe, steps=4)
        assert np.abs(v - v0).max() > 1e-7  # skipping late uncond changes output
    finally:
        pipe.enable_cfg_skip(0.0)


def test_riflex_changes_output(pipe):
    v0 = _run(pipe)
    pipe.enable_riflex(k=2, L_test=3, L_test_scale=4.886)
    v1 = _run(pipe)
    pipe._angles = tuple(  # restore
        jnp.asarray(a) for a in __import__(
            "versecrafter_tpu.kernels.rope", fromlist=["rope_3d_angles"]
        ).rope_3d_angles(DIT_CFG.head_dim, DIT_CFG.rope_max_pos))
    assert np.abs(v0 - v1).max() > 1e-7


def test_subject_ref_images(pipe):
    """Reference frames prepend temporally to the geoada context and are
    stripped from the output latents (pipeline:428-486, 927-930)."""
    rng = np.random.default_rng(9)
    refs = [rng.random((1, 3, 1, 8, 8)).astype(np.float32)]
    v = pipe(
        "with a reference subject", control_videos=_controls(),
        mask_video=_mask(), subject_ref_images=refs,
        height=8, width=8, num_frames=5, num_inference_steps=2,
        guidance_scale=2.0, shift=3.0, seed=4, dtype=jnp.float32)
    # output frame count unchanged despite the internal ref slot
    assert v.shape == (1, 5, 8, 8, 3)
    assert np.isfinite(v).all()
    ctx, n_ref = pipe.encode_controls(_controls(), _mask(), jnp.float32,
                                      subject_ref_images=refs)
    assert n_ref == 1
    assert ctx.shape[2] == 3 + 1  # latent frames + 1 ref slot
    # ref slot: first control's channels carry the ref latent, mask zeros
    assert float(jnp.abs(ctx[:, :4, 0]).max()) > 0
    assert float(jnp.abs(ctx[:, 8:, 0]).max()) == 0.0


def test_video_masked_init_conditioning(pipe):
    """video= encodes the masked init video as the single geoada source
    (pipeline_wan_versecrafter.py:793-807 intended semantics). Equivalence
    check against the explicit control path: passing the pre-masked video as
    the control must produce the identical output."""
    rng = np.random.default_rng(3)
    v = rng.random((1, 3, 5, 8, 8)).astype(np.float32)
    m = _mask()
    # tiny DIT expects geoada_in_dim=12 = 2 controls; a single video gives
    # 4 + 4 = 8 -> use a one-control config
    cfg1 = dataclasses.replace(DIT_CFG, geoada_in_dim=8)
    p1 = VerseCrafterPipeline(
        dit_params=init_wan_dit(jax.random.key(0), cfg1, jnp.float32),
        dit_cfg=cfg1, vae_params=pipe.vae_params, vae_cfg=VAE_CFG,
        t5_params=pipe.t5_params, t5_cfg=T5_CFG, scheduler_name="unipc")
    out_video = p1("x", video=v, mask_video=m, height=8, width=8,
                   num_frames=5, num_inference_steps=2, guidance_scale=2.0,
                   shift=3.0, seed=5, dtype=jnp.float32)
    keep = (m < 0.5).astype(np.float32)
    masked = v * keep + 0.5 * (1.0 - keep)
    out_ctrl = p1("x", control_videos=[masked], mask_video=m, height=8,
                  width=8, num_frames=5, num_inference_steps=2,
                  guidance_scale=2.0, shift=3.0, seed=5, dtype=jnp.float32)
    np.testing.assert_allclose(out_video, out_ctrl, atol=1e-6)
    # and video= without a mask is an explicit error
    with pytest.raises(ValueError, match="mask_video"):
        p1("x", video=v, height=8, width=8, num_frames=5,
           num_inference_steps=1, dtype=jnp.float32)


def test_custom_timesteps(pipe):
    """timesteps= overrides the schedule (retrieve_timesteps passthrough)."""
    out = _run(pipe, timesteps=[800.0, 400.0, 100.0])
    assert out.shape[1] == 5 and np.isfinite(out).all()
    # different schedule -> different result than the default 4-step run
    base = _run(pipe)
    assert np.abs(out - base).max() > 1e-6


def test_latents_override(pipe):
    """latents= replaces the seeded init noise; same latents -> same video
    regardless of seed."""
    lat = pipe("x", control_videos=_controls(), mask_video=_mask(),
               height=8, width=8, num_frames=5, num_inference_steps=1,
               guidance_scale=1.0, seed=11, dtype=jnp.float32,
               output_type="latent")
    a = _run(pipe, seed=1, latents=jnp.ones_like(lat) * 0.3)
    b = _run(pipe, seed=2, latents=jnp.ones_like(lat) * 0.3)
    np.testing.assert_allclose(a, b, atol=1e-6)
    with pytest.raises(ValueError, match="latents"):
        _run(pipe, latents=jnp.ones((1, 2, 2, 2, 2), jnp.float32))


def test_prompt_embeds_passthrough(pipe):
    """prompt_embeds/negative_prompt_embeds skip the T5 encode and must
    reproduce the in-pipeline encoding exactly."""
    ctx = pipe.encode_prompt("a car drives left", "static")
    neg, pos = np.split(np.asarray(ctx), 2, axis=0)
    a = _run(pipe)
    b = pipe(prompt_embeds=jnp.asarray(pos),
             negative_prompt_embeds=jnp.asarray(neg),
             control_videos=_controls(), mask_video=_mask(),
             height=8, width=8, num_frames=5, num_inference_steps=4,
             guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_callback_on_step_end(pipe):
    """callback_on_step_end sees every step and can replace latents."""
    calls = []

    def cb(p, i, t, kw):
        calls.append((i, t))
        assert "latents" in kw
        if i == 0:
            return {"latents": kw["latents"] * 0.0}
        return None

    out = _run(pipe, callback_on_step_end=cb)
    assert len(calls) == 4
    assert calls[0][0] == 0 and calls[-1][0] == 3
    base = _run(pipe)
    # zeroing the latents after step 0 must change the trajectory
    assert np.abs(out - base).max() > 1e-6


def test_prompt_embeds_default_negative_matches_encoded_empty(pipe):
    """prompt_embeds WITHOUT negative_prompt_embeds must behave like the
    prompt-string path: the uncond branch is the T5 encoding of the empty
    negative prompt, not a zeros context."""
    ctx = pipe.encode_prompt("a car drives left")  # default negative ""
    neg, pos = np.split(np.asarray(ctx), 2, axis=0)
    kw = dict(control_videos=_controls(), mask_video=_mask(),
              height=8, width=8, num_frames=5, num_inference_steps=4,
              guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)
    a = pipe(prompt_embeds=jnp.asarray(pos),
             negative_prompt_embeds=jnp.asarray(neg), **kw)
    b = pipe(prompt_embeds=jnp.asarray(pos), **kw)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_missing_prompt_raises(pipe):
    with pytest.raises(ValueError, match="prompt"):
        pipe(control_videos=_controls(), mask_video=_mask(),
             height=8, width=8, num_frames=5, num_inference_steps=2)
