"""umT5 encoder (text conditioning), TPU-native.

Re-implements the capability the reference consumes as `WanT5EncoderModel`
(/root/reference/config/wan2.1/wan_civitai.yaml:14-26: umT5-xxl, 24 layers,
d=4096, ffn 10240 gated-GELU, 64 heads, vocab 256384, per-layer relative
position bias i.e. shared_pos=False; called by the pipeline at
pipeline_wan_versecrafter.py:273 with a 512-token padded batch + attention
mask).

Architecture follows the public umT5 design (T5 v1.1 encoder with per-layer
relative attention bias): pre-RMSNorm blocks, unscaled q·k attention with
bucketed relative position bias, gated-GELU FFN, final RMSNorm. Weight
conversion accepts HuggingFace UMT5EncoderModel state dicts (convert_hf_umt5)
— the torch checkpoint the reference loads
(models_t5_umt5-xxl-enc-bf16.pth) uses the same tensor shapes.

Runs once per prompt (not hot): plain XLA ops, fp32 softmax, no Pallas.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.config import T5Config

Params = Dict[str, Any]


def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """T5 RMSNorm: no mean subtraction, no bias; stats in fp32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def relative_position_bucket(relative_position: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket function (host-side; positions are static)."""
    ret = np.zeros_like(relative_position)
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


def _position_bias(rel_bias_emb: jnp.ndarray, qlen: int, klen: int,
                   num_buckets: int, max_distance: int) -> jnp.ndarray:
    """[n_heads, qlen, klen] from the bucket embedding [num_buckets, n_heads]."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    buckets = relative_position_bucket(mem - ctx, num_buckets, max_distance)
    bias = rel_bias_emb[jnp.asarray(buckets)]  # [q, k, n]
    return bias.transpose(2, 0, 1)


def _attention(p: Params, cfg: T5Config, x: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    b, s, _ = x.shape
    n = cfg.num_heads
    hd = cfg.dim_attn // n
    q = jnp.dot(x, p["q"].astype(x.dtype)).reshape(b, s, n, hd)
    k = jnp.dot(x, p["k"].astype(x.dtype)).reshape(b, s, n, hd)
    v = jnp.dot(x, p["v"].astype(x.dtype)).reshape(b, s, n, hd)
    # T5: unscaled dot product; bias added pre-softmax
    scores = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32))
    bias = _position_bias(p["rel_bias"], s, s, cfg.num_buckets,
                          cfg.rel_pos_max_distance).astype(jnp.float32)
    scores = scores + bias[None]
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", w, v).reshape(b, s, -1)
    return jnp.dot(out, p["o"].astype(out.dtype))


def _ffn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    gate = jax.nn.gelu(jnp.dot(x, p["wi_0"].astype(x.dtype)), approximate=True)
    h = gate * jnp.dot(x, p["wi_1"].astype(x.dtype))
    return jnp.dot(h, p["wo"].astype(h.dtype))


def t5_encode(params: Params, cfg: T5Config, input_ids: jnp.ndarray,
              attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, L] token ids -> [B, L, dim] encoder states."""
    x = params["embed"][input_ids].astype(jnp.bfloat16 if params["embed"].dtype == jnp.bfloat16 else params["embed"].dtype)
    for blk in params["blocks"]:
        h = t5_layer_norm(x, blk["norm1"], cfg.eps)
        x = x + _attention(blk["attn"], cfg, h, attention_mask)
        h = t5_layer_norm(x, blk["norm2"], cfg.eps)
        x = x + _ffn(blk["ffn"], h)
    x = t5_layer_norm(x, params["final_norm"], cfg.eps)
    if attention_mask is not None:
        x = x * attention_mask[..., None].astype(x.dtype)
    return x


def init_t5(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> Params:
    """Random init from ONE bulk normal draw, sliced per leaf.

    A per-leaf `jax.random.normal` graph (~200 RNG ops for umT5-xxl) is
    mathematically equivalent but compiles pathologically slowly on some
    backends (minutes per process on the axon AOT compile helper vs seconds
    for this form); one bulk draw PER LAYER (25 RNG ops, fp32 temp ~0.8 GB
    each — a single whole-model draw would be a 23 GB fp32 temp) keeps both
    the compile and peak memory small. Values are i.i.d. N(0,1)·scale
    either way."""
    d, da, dff = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    per_block = [
        ((d, da), (d * (da // cfg.num_heads)) ** -0.5),
        ((d, da), d ** -0.5),
        ((d, da), d ** -0.5),
        ((da, d), (cfg.num_heads * (da // cfg.num_heads)) ** -0.5),
        ((cfg.num_buckets, cfg.num_heads), 2.0 / math.sqrt(d)),
        ((d, dff), d ** -0.5),
        ((d, dff), d ** -0.5),
        ((dff, d), dff ** -0.5),
    ]
    blk_total = sum(int(np.prod(s)) for s, _ in per_block)
    keys = jax.random.split(key, cfg.num_layers + 1)

    params: Params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab, d)).astype(dtype),
        "final_norm": jnp.ones((d,), jnp.float32),
        "blocks": [],
    }
    for li in range(cfg.num_layers):
        flat = jax.random.normal(keys[li + 1], (blk_total,))
        leaves, off = [], 0
        for s, sc in per_block:
            n = int(np.prod(s))
            leaves.append(flat[off:off + n].reshape(s) * sc)
            off += n
        qs, ks, vs, os_, rb, w0, w1, wo = leaves
        params["blocks"].append({
            "norm1": jnp.ones((d,), jnp.float32),
            "attn": {
                "q": qs.astype(dtype),
                "k": ks.astype(dtype),
                "v": vs.astype(dtype),
                "o": os_.astype(dtype),
                "rel_bias": rb.astype(jnp.float32),
            },
            "norm2": jnp.ones((d,), jnp.float32),
            "ffn": {
                "wi_0": w0.astype(dtype),
                "wi_1": w1.astype(dtype),
                "wo": wo.astype(dtype),
            },
        })
    return params


def convert_hf_umt5(state_dict, cfg: T5Config, dtype=jnp.bfloat16) -> Params:
    """Convert a HuggingFace UMT5EncoderModel state_dict (torch tensors or
    numpy arrays) into this module's param pytree."""
    def g(name):
        t = state_dict[name]
        arr = t.detach().to("cpu").float().numpy() if hasattr(t, "detach") else np.asarray(t)
        return arr

    def lin(name):  # torch Linear stores [out, in]; we use [in, out]
        return jnp.asarray(g(name).T, dtype)

    params: Params = {
        "embed": jnp.asarray(g("shared.weight"), dtype),
        "final_norm": jnp.asarray(g("encoder.final_layer_norm.weight"), jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        params["blocks"].append({
            "norm1": jnp.asarray(g(f"{pre}.0.layer_norm.weight"), jnp.float32),
            "attn": {
                "q": lin(f"{pre}.0.SelfAttention.q.weight"),
                "k": lin(f"{pre}.0.SelfAttention.k.weight"),
                "v": lin(f"{pre}.0.SelfAttention.v.weight"),
                "o": lin(f"{pre}.0.SelfAttention.o.weight"),
                "rel_bias": jnp.asarray(
                    g(f"{pre}.0.SelfAttention.relative_attention_bias.weight"),
                    jnp.float32),
            },
            "norm2": jnp.asarray(g(f"{pre}.1.layer_norm.weight"), jnp.float32),
            "ffn": {
                "wi_0": lin(f"{pre}.1.DenseReluDense.wi_0.weight"),
                "wi_1": lin(f"{pre}.1.DenseReluDense.wi_1.weight"),
                "wo": lin(f"{pre}.1.DenseReluDense.wo.weight"),
            },
        })
    return params
