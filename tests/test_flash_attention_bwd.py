"""Flash-attention backward kernels vs jax.grad of the XLA reference
(interpret mode on the CPU test mesh; same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.kernels.flash_attention import (attention_reference,
                                                      flash_attention)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        # non-trivial cotangent: weight by a fixed random tensor
        w = jnp.asarray(
            np.random.default_rng(99).standard_normal(out.shape), out.dtype)
        return jnp.sum(out.astype(jnp.float32) * w.astype(jnp.float32))
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("sq,skv", [(256, 256), (256, 384), (130, 200)])
def test_grads_match_reference(sq, skv):
    q = _rand((1, 2, sq, 128), 0)
    k = _rand((1, 2, skv, 128), 1)
    v = _rand((1, 2, skv, 128), 2)
    got = _grads(lambda q, k, v: flash_attention(
        q, k, v, impl="pallas", block_q=128, block_kv=128), q, k, v)
    want = _grads(attention_reference, q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_grads_with_k_lens():
    q = _rand((2, 1, 128, 128), 3)
    k = _rand((2, 1, 256, 128), 4)
    v = _rand((2, 1, 256, 128), 5)
    k_lens = jnp.asarray([100, 256], jnp.int32)
    got = _grads(lambda q, k, v: flash_attention(
        q, k, v, k_lens=k_lens, impl="pallas", block_q=128, block_kv=128),
        q, k, v)
    want = _grads(lambda q, k, v: attention_reference(q, k, v, k_lens=k_lens),
                  q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")
    # masked-out keys must receive exactly zero gradient
    assert float(jnp.abs(got[1][0, :, 100:]).max()) == 0.0
    assert float(jnp.abs(got[2][0, :, 100:]).max()) == 0.0


@pytest.mark.parametrize("window", [(64, 64), (-1, 0)])
def test_grads_with_window(window):
    q = _rand((1, 1, 384, 128), 6)
    k = _rand((1, 1, 384, 128), 7)
    v = _rand((1, 1, 384, 128), 8)
    got = _grads(lambda q, k, v: flash_attention(
        q, k, v, impl="pallas", block_q=128, block_kv=128,
        window_size=window), q, k, v)
    want = _grads(lambda q, k, v: attention_reference(
        q, k, v, window_size=window), q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")


def test_train_step_differentiates_pallas_path():
    """The training stack (flow_matching_loss -> blocks -> flash_attention
    impl='pallas') must produce finite grads — the regression that motivated
    the backward kernels."""
    import dataclasses

    import optax

    from versecrafter_tpu.core.config import WanDiTConfig
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.parallel.train_step import (make_train_step,
                                                      split_trainable)
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles

    cfg = WanDiTConfig(in_dim=4, dim=128, ffn_dim=256, freq_dim=32,
                       text_dim=48, out_dim=4, num_heads=1, num_layers=2,
                       text_len=16, geoada_layers=(), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    # zero-init head (reference-faithful) blocks all upstream gradient;
    # unzero it as a trained checkpoint would be
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.key(42), params["head"]["head"]["kernel"].shape) * 0.02
    train, frozen = split_trainable(params)
    opt = optax.adamw(1e-4)
    step = make_train_step(cfg, opt, attn_impl="pallas")

    f, h, w = 2, 4, 4
    x0 = _rand((1, 4, f, h * 2, w * 2), 9)
    geo = _rand((1, 8, f, h * 2, w * 2), 10)
    ctx = _rand((1, 16, 48), 11)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim, max_pos=64))
    cos, sin = grid_cos_sin(ang, f, h, w)
    new_train, _, loss = jax.jit(step)(
        train, frozen, opt.init(train), jax.random.key(1), x0, ctx, cos, sin, geo)
    assert np.isfinite(float(loss))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(new_train),
                        jax.tree_util.tree_leaves(train)))
    assert moved


def test_sp_training_ring_path():
    """Training on a mesh whose sp does not divide the head count forces the
    ring-attention path; its custom backward must produce a finite loss and
    moving params (8-device CPU mesh, sp=8, heads=4)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from versecrafter_tpu.core.config import WanDiTConfig
    from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.parallel.sharding import (mesh_context,
                                                    shard_dit_params)
    from versecrafter_tpu.parallel.train_step import (make_train_step,
                                                      split_trainable)

    mesh = make_mesh(MeshSpec(sp=8), devices=jax.devices()[:8])
    cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=48, out_dim=4, num_heads=4, num_layers=2,
                       text_len=16, geoada_layers=(), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.key(42), params["head"]["head"]["kernel"].shape) * 0.02
    params = shard_dit_params(params, mesh)
    train, frozen = split_trainable(params)
    opt = optax.adamw(1e-3)
    step = make_train_step(cfg, opt, attn_impl="sp")

    f, h, w = 2, 8, 8  # 2*4*4 = 32 tokens -> 4 per sp shard
    x0 = _rand((1, 4, f, h * 2, w * 2), 20)
    geo = _rand((1, 8, f, h * 2, w * 2), 21)
    ctx = _rand((1, 16, 48), 22)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim, max_pos=64))
    cos, sin = grid_cos_sin(ang, f, h, w)
    with mesh_context(mesh):
        new_train, _, loss = jax.jit(step)(
            train, frozen, opt.init(train), jax.random.key(1),
            x0, ctx, cos, sin, geo)
    assert np.isfinite(float(loss))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(new_train),
                        jax.tree_util.tree_leaves(train)))
    assert moved

def test_stats_api_differentiable_through_out():
    """flash_attention_with_stats carries a vjp for `out` (m/l cotangents
    are ignored by design — the ring merge differentiates itself)."""
    from versecrafter_tpu.kernels.flash_attention import (
        flash_attention_with_stats)

    q = _rand((1, 2, 256, 64), 0)
    k = _rand((1, 2, 256, 64), 1)
    v = _rand((1, 2, 256, 64), 2)

    def loss(impl):
        def f(q, k, v):
            o, _m, _l = flash_attention_with_stats(
                q, k, v, impl=impl, block_q=128, block_kv=128)
            return (o.astype(jnp.float32) ** 2).sum()
        return f

    got = jax.grad(loss("pallas"), (0, 1, 2))(q, k, v)
    want = jax.grad(loss("xla"), (0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")
