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


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, impl: str = "auto") -> jnp.ndarray:
    """Full attention with q/k/v sequence-sharded over `axis_name`.

    Must run inside shard_map. q, k, v: local shards [B, N, S/sp, D].
    Returns the local output shard [B, N, S/sp, D] — exact (non-causal)
    attention over the full sequence."""
    sp = jax.lax.psum(1, axis_name)
    o, m, l = flash_attention_with_stats(q, k, v, impl=impl)
    kb, vb = k, v
    perm = [(j, (j + 1) % sp) for j in range(sp)]
    for _ in range(sp - 1):
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        o2, m2, l2 = flash_attention_with_stats(q, kb, vb, impl=impl)
        o, m, l = _merge(o, m, l, o2, m2, l2)
    return o
