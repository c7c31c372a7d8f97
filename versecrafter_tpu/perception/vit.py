"""Generic ViT encoder (JAX): backbone for the perception models.

Used by the MoGe-style depth estimator (DINOv2 ViT-L/14 layout) and as the
image-encoder skeleton for the segmentation stack. Plain pre-norm ViT:
patch embed (conv-as-matmul), learned/interpolated position embeddings,
MHSA + MLP blocks via lax.scan over stacked params.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from versecrafter_tpu.kernels.norms import layer_norm

Params = Dict[str, Any]


def _dense(key, cin, cout, dtype, std=None):
    std = std if std is not None else (2.0 / (cin + cout)) ** 0.5
    return {"kernel": (jax.random.normal(key, (cin, cout)) * std).astype(dtype),
            "bias": jnp.zeros((cout,), dtype)}


def init_vit(key, *, patch: int = 14, dim: int = 1024, depth: int = 24,
             heads: int = 16, mlp_ratio: float = 4.0, in_ch: int = 3,
             num_registers: int = 0, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 16))
    nk = lambda: next(ks)
    mlp = int(dim * mlp_ratio)
    blocks = []
    bkeys = jax.random.split(nk(), depth)
    for bk in bkeys:
        b = jax.random.split(bk, 4)
        blocks.append({
            "norm1": {"scale": jnp.ones((dim,), jnp.float32),
                      "bias": jnp.zeros((dim,), jnp.float32)},
            "qkv": _dense(b[0], dim, 3 * dim, dtype),
            "proj": _dense(b[1], dim, dim, dtype),
            "norm2": {"scale": jnp.ones((dim,), jnp.float32),
                      "bias": jnp.zeros((dim,), jnp.float32)},
            "fc1": _dense(b[2], dim, mlp, dtype),
            "fc2": _dense(b[3], mlp, dim, dtype),
        })
    return {
        "patch_embed": _dense(nk(), in_ch * patch * patch, dim, dtype),
        "cls_token": jnp.zeros((1, 1 + num_registers, dim), dtype),
        "pos_embed": (jax.random.normal(nk(), (1, 1 + 37 * 37, dim)) * 0.02).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"scale": jnp.ones((dim,), jnp.float32),
                 "bias": jnp.zeros((dim,), jnp.float32)},
    }


def _mhsa(p, x, heads):
    b, n, d = x.shape
    hd = d // heads
    qkv = jnp.dot(x, p["qkv"]["kernel"].astype(x.dtype)) + p["qkv"]["bias"].astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(b, n, 3, heads, hd), 3, axis=2)
    q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    return jnp.dot(o, p["proj"]["kernel"].astype(o.dtype)) + p["proj"]["bias"].astype(o.dtype)


def _interp_pos(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Bicubic-ish (bilinear) resize of the grid part of pos embeddings."""
    n = pos.shape[1] - 1
    side = int(math.sqrt(n))
    cls, grid = pos[:, :1], pos[:, 1:]
    grid = grid.reshape(1, side, side, -1)
    grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bilinear")
    return jnp.concatenate([cls, grid.reshape(1, gh * gw, -1)], axis=1)


def vit_forward(params: Params, x: jnp.ndarray, *, patch: int = 14,
                heads: int = 16,
                out_layers: Optional[Sequence[int]] = None):
    """x: [B, H, W, 3] -> final tokens [B, 1+N, D]; if out_layers given, also
    returns the intermediate token maps (post-block) for DPT-style heads."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    xp = x.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(b, gh * gw, c * patch * patch)
    tok = jnp.dot(xp, params["patch_embed"]["kernel"].astype(xp.dtype)) \
        + params["patch_embed"]["bias"].astype(xp.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype),
                           (b, params["cls_token"].shape[1], tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = _interp_pos(params["pos_embed"], gh, gw).astype(tok.dtype)
    npos = min(pos.shape[1], tok.shape[1])
    tok = tok.at[:, :npos].add(pos[:, :npos]) if tok.shape[1] != pos.shape[1] \
        else tok + pos

    tapped: Dict[int, jnp.ndarray] = {}
    depth = jax.tree.leaves(params["blocks"])[0].shape[0]
    want = set(out_layers or [])

    # python loop (not scan) so intermediate layers can be tapped
    for i in range(depth):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        hln = layer_norm(tok, bp["norm1"]["scale"], bp["norm1"]["bias"])
        tok = tok + _mhsa(bp, hln, heads)
        hln = layer_norm(tok, bp["norm2"]["scale"], bp["norm2"]["bias"])
        m = jnp.dot(jax.nn.gelu(
            jnp.dot(hln, bp["fc1"]["kernel"].astype(hln.dtype)) + bp["fc1"]["bias"].astype(hln.dtype)),
            bp["fc2"]["kernel"].astype(hln.dtype)) + bp["fc2"]["bias"].astype(hln.dtype)
        tok = tok + m
        if i in want:
            tapped[i] = tok

    tok = layer_norm(tok, params["norm"]["scale"], params["norm"]["bias"])
    if out_layers is not None:
        return tok, [tapped[i] for i in out_layers]
    return tok
