"""Ring attention: exactness vs single-device attention on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
from versecrafter_tpu.kernels.flash_attention import (
    attention_reference, flash_attention_with_stats)
from versecrafter_tpu.kernels.ring_attention import _merge, ring_attention
from versecrafter_tpu.parallel.sharding import (
    mesh_context, ring_sp_attention, sequence_parallel_attention)


def _qkv(b=1, n=2, s=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, n, s, d)), jnp.float32)
                 for _ in range(3))


def test_stats_match_reference():
    q, k, v = _qkv()
    o, m, l = flash_attention_with_stats(q, k, v, impl="xla")
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want), rtol=1e-5, atol=1e-5)
    assert m.shape == (1, 2, 64)


def test_merge_recovers_full_attention():
    """Merging partial attentions over two KV halves == full attention."""
    q, k, v = _qkv(s=64)
    o1, m1, l1 = flash_attention_with_stats(q, k[:, :, :32], v[:, :, :32], impl="xla")
    o2, m2, l2 = flash_attention_with_stats(q, k[:, :, 32:], v[:, :, 32:], impl="xla")
    o, m, l = _merge(o1, m1, l1, o2, m2, l2)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_attention_matches_full(sp):
    q, k, v = _qkv(n=2, s=64)
    want = attention_reference(q, k, v)
    mesh = make_mesh(MeshSpec(sp=sp), devices=jax.devices()[:sp])
    spec = P(None, None, "sp", None)
    fn = shard_map(lambda a, b, c: ring_attention(a, b, c, axis_name="sp"),
                   mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                   check_vma=False)
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ring_sp_attention_wrapper():
    """sp=8 with only 2 heads: Ulysses is impossible, the dispatcher must
    route to the ring and still be exact."""
    q, k, v = _qkv(n=2, s=64, seed=3)
    want = attention_reference(q, k, v)
    mesh = make_mesh(MeshSpec(sp=8))
    with mesh_context(mesh):
        got = jax.jit(sequence_parallel_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_attention_gradients(sp):
    """Ring backward (rotating fa_backward against global logsumexp) must
    match jax.grad of full single-device attention."""
    q, k, v = _qkv(n=2, s=256, d=128, seed=7)
    w = jnp.asarray(np.random.default_rng(8).standard_normal(q.shape),
                    jnp.float32)

    def loss_full(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * w)

    want = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)

    mesh = make_mesh(MeshSpec(sp=sp), devices=jax.devices()[:sp])
    spec = P(None, None, "sp", None)
    ring = shard_map(lambda a, b, c: ring_attention(a, b, c, axis_name="sp"),
                     mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                     check_vma=False)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) * w)

    shard = NamedSharding(mesh, spec)
    got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(
        *(jax.device_put(t, shard) for t in (q, k, v)))
    for g, ref, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3, err_msg=f"d{name}")
