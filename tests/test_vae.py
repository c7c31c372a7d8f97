"""3D causal VAE tests: compression contract, temporal causality, shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import VAEConfig
from versecrafter_tpu.models.vae import (
    init_vae,
    latent_frames,
    vae_decode,
    vae_encode,
)

# tiny VAE for tests: same topology, small dims
TINY = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                 temporal_downsample=(False, True), spatial_compression_ratio=4,
                 temporal_compression_ratio=2, use_latent_stats=False)


@pytest.fixture(scope="module")
def tiny_vae():
    return init_vae(jax.random.key(0), TINY, dtype=jnp.float32)


def _video(t=9, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((1, 3, t, h, w)) * 0.5, jnp.float32)


def test_encode_shape_contract(tiny_vae):
    x = _video(t=9)
    z = vae_encode(tiny_vae, TINY, x)
    # (T-1)/2+1 = 5 temporal, /4 spatial for the tiny config
    assert z.shape == (1, TINY.z_dim, 5, 4, 4)


def test_decode_shape_contract(tiny_vae):
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, TINY.z_dim, 5, 4, 4)), jnp.float32)
    y = vae_decode(tiny_vae, TINY, z)
    assert y.shape == (1, 3, 9, 16, 16)


def test_single_frame_roundtrip_shapes(tiny_vae):
    x = _video(t=1)
    z = vae_encode(tiny_vae, TINY, x)
    assert z.shape[2] == 1
    y = vae_decode(tiny_vae, TINY, z)
    assert y.shape[2] == 1


def test_encoder_temporal_causality(tiny_vae):
    """Perturbing the last input frame must not change earlier latents."""
    x1 = _video(t=9, seed=2)
    x2 = x1.at[:, :, -1].add(10.0)
    z1 = vae_encode(tiny_vae, TINY, x1)
    z2 = vae_encode(tiny_vae, TINY, x2)
    # latent frame i covers input frames <= 2i; all but the last latent
    # frame are unaffected by editing input frame 8
    np.testing.assert_allclose(np.asarray(z1[:, :, :-1]), np.asarray(z2[:, :, :-1]),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(z1[:, :, -1]) - np.asarray(z2[:, :, -1])).max() > 1e-4


def test_decoder_temporal_causality(tiny_vae):
    z1 = jnp.asarray(np.random.default_rng(3).standard_normal((1, TINY.z_dim, 5, 4, 4)), jnp.float32)
    z2 = z1.at[:, :, -1].add(10.0)
    y1 = vae_decode(tiny_vae, TINY, z1)
    y2 = vae_decode(tiny_vae, TINY, z2)
    # output frames 0..5 depend only on latent frames 0..3 (latent frame i
    # maps to output frames 2i-1, 2i; keep a safety margin of one frame)
    np.testing.assert_allclose(np.asarray(y1[:, :, :6]), np.asarray(y2[:, :, :6]),
                               rtol=1e-4, atol=1e-5)


def test_mode_is_deterministic(tiny_vae):
    x = _video(t=5, seed=4)
    z1 = vae_encode(tiny_vae, TINY, x)
    z2 = vae_encode(tiny_vae, TINY, x)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_sample_differs_from_mode(tiny_vae):
    x = _video(t=5, seed=5)
    zm = vae_encode(tiny_vae, TINY, x)
    zs = vae_encode(tiny_vae, TINY, x, sample=True, rng=jax.random.key(0))
    assert np.abs(np.asarray(zm) - np.asarray(zs)).max() > 1e-6


def test_latent_frames_wan_contract():
    assert latent_frames(81) == 21
    assert latent_frames(1) == 1
    assert latent_frames(49) == 13


def test_wan_full_config_init_small_input():
    """Full Wan topology (96 base dims) on a tiny input: 4x temporal, 8x
    spatial, 16 channels."""
    cfg = VAEConfig()
    params = init_vae(jax.random.key(1), cfg, dtype=jnp.float32)
    x = _video(t=5, h=32, w=32, seed=6)
    z = vae_encode(params, cfg, x)
    assert z.shape == (1, 16, 2, 4, 4)
    y = vae_decode(params, cfg, z)
    assert y.shape == (1, 3, 5, 32, 32)
