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


def test_pipeline_streaming_decode_overlapped_matches_plain(vae):
    """decode_latents' overlapped streaming path (chunk downloads on a
    worker thread) == the plain whole-video decode, both output types."""
    import numpy as np

    from versecrafter_tpu.core.config import T5Config, WanDiTConfig
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    dit_cfg = WanDiTConfig(in_dim=TINY.z_dim, dim=32, ffn_dim=64,
                           freq_dim=16, text_dim=16, out_dim=TINY.z_dim,
                           num_heads=2, num_layers=1, text_len=8,
                           geoada_layers=None)
    t5_cfg = T5Config(vocab=64, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
                      num_layers=1, num_buckets=4, text_length=8)
    pipe = VerseCrafterPipeline(
        dit_params=init_wan_dit(jax.random.key(0), dit_cfg, jnp.float32),
        dit_cfg=dit_cfg, vae_params=vae, vae_cfg=TINY,
        t5_params=init_t5(jax.random.key(1), t5_cfg, jnp.float32),
        t5_cfg=t5_cfg)
    lat = jax.random.normal(jax.random.key(2), (1, TINY.z_dim, 3, 4, 4),
                            jnp.float32)
    plain = pipe.decode_latents(lat, "numpy")
    for out_type in ("numpy", "uint8"):
        got = pipe._decode_stream_overlapped(lat, out_type)
        want = plain if out_type == "numpy" else (
            np.clip(plain, 0, 1) * 255.0).astype(np.uint8)
        np.testing.assert_allclose(got, want, atol=2e-5 if
                                   out_type == "numpy" else 1)
