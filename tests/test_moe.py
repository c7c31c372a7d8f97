"""Wan2.2 timestep-MoE: two-expert selection by sigma boundary."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig
from versecrafter_tpu.models.t5 import init_t5
from versecrafter_tpu.models.vae import init_vae
from versecrafter_tpu.models.wan_dit import init_wan_dit
from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

VAE_CFG = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temporal_downsample=(True,), spatial_compression_ratio=2,
                    temporal_compression_ratio=2, use_latent_stats=False)
T5_CFG = T5Config(vocab=256, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                  num_layers=1, num_buckets=8, text_length=16)
DIT_CFG = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=32, out_dim=4, num_heads=2, num_layers=2,
                       text_len=16, geoada_layers=(), geoada_in_dim=12)


def _live(seed):
    p = init_wan_dit(jax.random.key(seed), DIT_CFG, jnp.float32)
    p["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(seed + 50),
                          p["head"]["head"]["kernel"].shape) * 0.05)
    return p


def _pipe(**kw):
    return VerseCrafterPipeline(
        dit_params=_live(0), dit_cfg=DIT_CFG,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG, **kw)


def _run(pipe):
    rng = np.random.default_rng(0)
    return pipe("x", control_videos=[rng.random((1, 3, 5, 8, 8)).astype(np.float32)
                                     for _ in range(2)],
                mask_video=np.ones((1, 1, 5, 8, 8), np.float32),
                height=8, width=8, num_frames=5, num_inference_steps=4,
                guidance_scale=2.0, shift=8.0, seed=3, dtype=jnp.float32)


def test_moe_selects_high_noise_expert_early():
    low_only = _run(_pipe())
    moe = _run(_pipe(dit_params_high=_live(7), moe_boundary=0.5))
    # the high-noise expert differs -> early steps diverge the trajectory
    assert np.abs(low_only - moe).max() > 1e-6


def test_moe_boundary_one_is_identity():
    """boundary > max sigma: the high expert is never selected."""
    low_only = _run(_pipe())
    moe = _run(_pipe(dit_params_high=_live(7), moe_boundary=1.01))
    np.testing.assert_array_equal(low_only, moe)


def test_moe_identical_experts_match_single():
    low_only = _run(_pipe())
    moe = _run(_pipe(dit_params_high=_live(0), moe_boundary=0.5))
    np.testing.assert_allclose(low_only, moe, rtol=1e-5, atol=1e-6)


def test_staged_expert_swap_matches_resident_moe():
    """expert_swap (staged timestep-MoE: experts are time-sequential, so
    only one is ever resident — the single-16GB-chip Wan2.2-14B mode)
    produces the SAME video as the both-resident dit_params_high path, and
    each expert is built exactly once (sigma descends monotonically)."""
    high, low = _live(7), _live(0)
    resident = _run(_pipe(dit_params_high=high, moe_boundary=0.5))

    calls = []

    def swap(which):
        calls.append(which)
        return high if which == "high" else low

    pipe = _pipe(moe_boundary=0.5, expert_swap=swap)
    pipe.dit_params = None  # staged shell: nothing resident up front
    staged = _run(pipe)

    assert calls == ["high", "low"], calls
    np.testing.assert_allclose(staged, resident, atol=1e-6)
