"""Ring attention: KV shards rotate around the `sp` axis while each device
accumulates partial attention with online-softmax merging.

TPU-native replacement for the reference's xfuser ring attention (P2P KV
rotation inside USP, /root/reference/versecrafter/models/
wan_transformer3d.py:906-921). The merge is the standard cross-shard
online-softmax combination (the same correction flash attention uses across
tiles, applied across devices); communication is `jax.lax.ppermute` —
point-to-point neighbor transfers over ICI, overlapped with the local flash
kernel by XLA's scheduler.

Use when sp must exceed what Ulysses can feed (sp > heads/tp) or when the
all_to_all volume dominates; `parallel.sharding.sequence_parallel_attention`
picks between them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from versecrafter_tpu.kernels.flash_attention import flash_attention_with_stats


def _merge(o1, m1, l1, o2, m2, l2):
    """Combine two partial attentions over disjoint KV sets."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m) * l2
    l = a1 + a2
    w1 = (a1 / jnp.maximum(l, 1e-38))[..., None].astype(o1.dtype)
    w2 = (a2 / jnp.maximum(l, 1e-38))[..., None].astype(o2.dtype)
    return o1 * w1 + o2 * w2, m, l


def _ring_forward(q, k, v, axis_name, impl):
    """The rotation loop; returns the local output shard plus the MERGED
    (global) online-softmax stats — the residuals the backward needs."""
    sp = jax.lax.psum(1, axis_name)
    o, m, l = flash_attention_with_stats(q, k, v, impl=impl)
    kb, vb = k, v
    perm = [(j, (j + 1) % sp) for j in range(sp)]
    for _ in range(sp - 1):
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        o2, m2, l2 = flash_attention_with_stats(q, kb, vb, impl=impl)
        o, m, l = _merge(o, m, l, o2, m2, l2)
    return o, m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, impl: str = "auto") -> jnp.ndarray:
    """Full attention with q/k/v sequence-sharded over `axis_name`.

    Must run inside shard_map. q, k, v: local shards [B, N, S/sp, D].
    Returns the local output shard [B, N, S/sp, D] — exact (non-causal)
    attention over the full sequence. Differentiable: the backward rotates
    (k, v, dk, dv) around the ring, running the flash backward kernels per
    visiting shard against the forward's merged (global) logsumexp — the
    per-shard recomputed probabilities are then exactly the global-softmax
    probabilities for those columns."""
    return _ring_forward(q, k, v, axis_name, impl)[0]


def _ring_fwd(q, k, v, axis_name, impl):
    o, m, l = _ring_forward(q, k, v, axis_name, impl)
    return o, (q, k, v, o, m, l)


def _ring_bwd(axis_name, impl, res, do):
    from versecrafter_tpu.kernels.flash_attention_bwd import fa_backward

    q, k, v, o, m, l = res
    B, N, S, D = q.shape
    sp = jax.lax.psum(1, axis_name)
    sm_scale = 1.0 / math.sqrt(D)
    k_lens = jnp.full((B,), k.shape[2], jnp.int32)
    interpret = jax.default_backend() != "tpu"
    bq = min(1024, -(-S // 128) * 128)
    bkv = min(1024, -(-k.shape[2] // 128) * 128)

    def local_bwd(kb, vb):
        # m, l are the GLOBAL merged stats, so fa_backward's recomputed
        # p = exp(s - (m + log l)) is the true global softmax on this shard
        return fa_backward(q, kb, vb, o, m, l, do, k_lens,
                           sm_scale=sm_scale, block_q=bq, block_kv=bkv,
                           interpret=interpret, masked=False)

    dq, dkb, dvb = local_bwd(k, v)
    kb, vb = k, v
    perm = [(j, (j + 1) % sp) for j in range(sp)]
    for _ in range(sp - 1):
        # dk/dv rotate WITH their shard so accumulation follows the data
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        dkb = jax.lax.ppermute(dkb, axis_name, perm)
        dvb = jax.lax.ppermute(dvb, axis_name, perm)
        dq_p, dk_p, dv_p = local_bwd(kb, vb)
        dq = dq + dq_p
        dkb = dkb + dk_p
        dvb = dvb + dv_p
    # after sp-1 rotations the buffers hold shard (r+1) mod sp; one more
    # hop sends every dk/dv home
    dkb = jax.lax.ppermute(dkb, axis_name, perm)
    dvb = jax.lax.ppermute(dvb, axis_name, perm)
    return dq.astype(q.dtype), dkb.astype(k.dtype), dvb.astype(v.dtype)


ring_attention.defvjp(_ring_fwd, _ring_bwd)
