"""Streaming VAE must be numerically identical to full-sequence processing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import VAEConfig
from versecrafter_tpu.models.vae import init_vae, vae_decode, vae_encode
from versecrafter_tpu.models.vae_stream import (
    vae_decode_chunked, vae_encode_chunked)

# tiny but WAN-topology config: two temporal downsamples (4x), 3 stages
TINY = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                 temporal_downsample=(False, True, True),
                 spatial_compression_ratio=8, temporal_compression_ratio=4,
                 use_latent_stats=False)


@pytest.fixture(scope="module")
def vae():
    return init_vae(jax.random.key(0), TINY, dtype=jnp.float32)


def test_encode_chunked_matches_full(vae):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 17, 16, 16)),
                    jnp.float32)
    full = vae_encode(vae, TINY, x)
    chunked = vae_encode_chunked(vae, TINY, x, frame_chunk=4)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_encode_chunked_bigger_chunks(vae):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 17, 16, 16)),
                    jnp.float32)
    full = vae_encode(vae, TINY, x)
    chunked = vae_encode_chunked(vae, TINY, x, frame_chunk=8)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_decode_chunked_matches_full(vae):
    z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 5, 2, 2)),
                    jnp.float32)
    full = vae_decode(vae, TINY, z)
    chunked = vae_decode_chunked(vae, TINY, z)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_wan_full_topology_small(vae):
    cfg = VAEConfig(use_latent_stats=True)
    params = init_vae(jax.random.key(1), cfg, jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 3, 9, 32, 32)),
                    jnp.float32)
    full = vae_encode(params, cfg, x)
    chunked = vae_encode_chunked(params, cfg, x)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-5)
    yf = vae_decode(params, cfg, full)
    yc = vae_decode_chunked(params, cfg, chunked)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yf),
                               rtol=1e-3, atol=1e-3)
