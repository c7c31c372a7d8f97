"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The key property: a mesh-sharded forward (dp/fsdp/sp/tp) must match the
single-device forward numerically — GSPMD + Ulysses shard_map is a layout,
not a different algorithm.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward
from versecrafter_tpu.parallel.sharding import (
    mesh_context, shard_dit_params, replicate)
from versecrafter_tpu.parallel.train_step import (
    make_train_step, split_trainable)

CFG = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32, text_dim=48,
                   out_dim=4, num_heads=8, num_layers=4, text_len=16,
                   geoada_layers=(), geoada_in_dim=8)


def _inputs(b=2, f=2, h=4, w=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, CFG.in_dim, f, h * 2, w * 2)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, 8, f, h * 2, w * 2)), jnp.float32)
    t = jnp.asarray([300.0] * b)
    ctx = jnp.asarray(rng.standard_normal((b, CFG.text_len, CFG.text_dim)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(CFG.head_dim, max_pos=64))
    cos, sin = grid_cos_sin(ang, f, h, w)
    return x, g, t, ctx, cos, sin


def _params():
    p = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    p["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(9), p["head"]["head"]["kernel"].shape) * 0.05)
    return p


@pytest.mark.parametrize("spec", [
    MeshSpec(sp=8), MeshSpec(sp=4, tp=2), MeshSpec(dp=2, sp=2, tp=2),
    MeshSpec(fsdp=2, sp=2, tp=2),
])
def test_sharded_forward_matches_single_device(spec):
    params = _params()
    x, g, t, ctx, cos, sin = _inputs()
    want = np.asarray(wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                      geoada_context=g))

    mesh = make_mesh(spec)
    sparams = shard_dit_params(params, mesh)
    with mesh_context(mesh):
        fwd = jax.jit(lambda p, *a: wan_dit_forward(
            p, CFG, *a, attn_impl="sp"))
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None, None, None)))
        got = np.asarray(fwd(sparams, xs, t, ctx, cos, sin, g))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_train_step_runs():
    """Full training step (grads + optax) over a (dp,fsdp,sp,tp) mesh with a
    frozen backbone and trainable GeoAdapter."""
    params = _params()
    mesh = make_mesh(MeshSpec(dp=2, fsdp=2, sp=2, tp=1))
    sparams = shard_dit_params(params, mesh)
    train, frozen = split_trainable(sparams)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(train)
    step = make_train_step(CFG, opt, attn_impl="sp")

    x, g, t, ctx, cos, sin = _inputs(b=2)
    with mesh_context(mesh):
        jstep = jax.jit(step)
        new_train, new_opt, loss = jstep(
            train, frozen, opt_state, jax.random.key(0), x, ctx, cos, sin, g)
        loss2 = jstep(new_train, frozen, new_opt, jax.random.key(1),
                      x, ctx, cos, sin, g)[2]
    assert np.isfinite(float(loss))
    assert np.isfinite(float(loss2))
    # geoada params actually updated
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), train, new_train)
    assert max(jax.tree.leaves(diff)) > 0.0


def test_fsdp_params_are_sharded():
    params = _params()
    mesh = make_mesh(MeshSpec(fsdp=4, tp=2))
    sparams = shard_dit_params(params, mesh)
    qk = sparams["blocks"]["self_attn"]["q"]["kernel"]
    # [L, D, D] sharded (None, fsdp, tp): each device holds 1/8 of the bytes
    shard_bytes = qk.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == qk.nbytes


def test_maybe_init_distributed_gating(monkeypatch):
    """Multi-host init is opt-in (env-gated) and idempotent: no-op without
    the env vars; calls jax.distributed.initialize exactly once when set;
    swallows the already-initialized RuntimeError."""
    from versecrafter_tpu.utils import cache

    calls = []

    class FakeDistributed:
        @staticmethod
        def initialize():
            calls.append(1)
            if len(calls) > 1:
                raise RuntimeError("already initialized")

    monkeypatch.setattr("jax.distributed", FakeDistributed)
    monkeypatch.delenv("VERSECRAFTER_MULTIHOST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert cache.maybe_init_distributed() is False
    assert not calls

    monkeypatch.setenv("VERSECRAFTER_MULTIHOST", "1")
    assert cache.maybe_init_distributed() is True
    assert cache.maybe_init_distributed() is False  # idempotent
    assert len(calls) == 2
