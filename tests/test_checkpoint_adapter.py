"""Orbax checkpointing + SimpleAdapter camera control."""

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.models.wan_dit import (
    _init_linear, init_wan_dit, simple_adapter)

CFG = WanDiTConfig(in_dim=4, dim=32, ffn_dim=64, freq_dim=32, text_dim=24,
                   out_dim=4, num_heads=2, num_layers=2, text_len=8)


def test_orbax_roundtrip(tmp_path):
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params)
    loaded = load_checkpoint(p, template=params)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(ka))


def test_simple_adapter_shapes():
    d, cam_ch, down = 32, 6, 4
    proj = {"conv": _init_linear(
        jax.random.key(1), cam_ch * down * down * 2 * 2, d, jnp.float32)}
    y_cam = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, cam_ch, 3, 32, 32)),
        jnp.float32)
    tok = simple_adapter(proj, y_cam, patch_size=(2, 2), downscale=down)
    # 32/4 = 8 spatial -> /2 patch -> 4x4; 3 frames -> 48 tokens
    assert tok.shape == (1, 3 * 4 * 4, d)
    assert np.isfinite(np.asarray(tok)).all()
