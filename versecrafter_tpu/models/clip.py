"""CLIP visual encoder for i2v conditioning, JAX.

The reference's i2v path feeds `clip_fea` (257 image tokens) from an
open-clip XLM-RoBERTa-large ViT-Huge-14 vision tower
(models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth,
/root/reference/config/wan2.1/wan_civitai.yaml:39; consumed by the DiT's
MLPProj + k_img/v_img attention, wan_transformer3d.py:647-659,1045-1047).

This is a standard pre-norm CLIP ViT: conv patch embed (stride=kernel ->
matmul), class token, learned positions, QuickGELU MLP blocks, final norm.
The i2v pipeline takes ALL token embeddings (cls + 256 patches = 257).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.kernels.norms import layer_norm

Params = Dict[str, Any]

VIT_HUGE_14 = dict(patch=14, dim=1280, depth=32, heads=16, img_size=224)
TEST_TINY = dict(patch=14, dim=32, depth=2, heads=2, img_size=56)

# CLIP normalization constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _dense(key, cin, cout, dtype):
    return {"kernel": (jax.random.normal(key, (cin, cout))
                       * (2.0 / (cin + cout)) ** 0.5).astype(dtype),
            "bias": jnp.zeros((cout,), dtype)}


def _mk_ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_clip_vision(key, cfg: dict = VIT_HUGE_14, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8 + 8 * cfg["depth"]))
    nk = lambda: next(ks)
    d = cfg["dim"]
    n_tok = (cfg["img_size"] // cfg["patch"]) ** 2 + 1
    return {
        "patch_embed": {"kernel": (jax.random.normal(nk(), (3 * cfg["patch"] ** 2, d))
                                   * d ** -0.5).astype(dtype)},  # no bias (CLIP)
        "cls": (jax.random.normal(nk(), (1, 1, d)) * 0.02).astype(dtype),
        "pos": (jax.random.normal(nk(), (1, n_tok, d)) * 0.02).astype(dtype),
        "pre_norm": _mk_ln(d),
        "blocks": [{
            "norm1": _mk_ln(d),
            "attn": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm2": _mk_ln(d),
            "fc1": _dense(nk(), d, 4 * d, dtype),
            "fc2": _dense(nk(), 4 * d, d, dtype),
        } for _ in range(cfg["depth"])],
        "post_norm": _mk_ln(d),
    }


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_forward(params: Params, cfg: dict, image: jnp.ndarray
                        ) -> jnp.ndarray:
    """image [B, H, W, 3] CLIP-normalized -> tokens [B, 1+N, D]
    (cls first — the 257 tokens the i2v cross-attention consumes)."""
    b, h, w, _ = image.shape
    p = cfg["patch"]
    x = image.reshape(b, h // p, p, w // p, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, (h // p) * (w // p), 3 * p * p)
    tok = jnp.dot(x, params["patch_embed"]["kernel"].astype(x.dtype))
    cls = jnp.broadcast_to(params["cls"].astype(tok.dtype), (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], 1)
    tok = tok + params["pos"][:, : tok.shape[1]].astype(tok.dtype)
    tok = layer_norm(tok, params["pre_norm"]["scale"], params["pre_norm"]["bias"])

    heads = cfg["heads"]
    d = tok.shape[-1]
    hd = d // heads
    for blk in params["blocks"]:
        xn = layer_norm(tok, blk["norm1"]["scale"], blk["norm1"]["bias"])
        q = jnp.dot(xn, blk["attn"]["q"]["kernel"].astype(xn.dtype)) + blk["attn"]["q"]["bias"].astype(xn.dtype)
        k = jnp.dot(xn, blk["attn"]["k"]["kernel"].astype(xn.dtype)) + blk["attn"]["k"]["bias"].astype(xn.dtype)
        v = jnp.dot(xn, blk["attn"]["v"]["kernel"].astype(xn.dtype)) + blk["attn"]["v"]["bias"].astype(xn.dtype)
        q = q.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bnqd,bnkd->bnqk", q, k) / math.sqrt(hd)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(tok.dtype)
        o = jnp.einsum("bnqk,bnkd->bnqd", a, v).transpose(0, 2, 1, 3).reshape(b, -1, d)
        tok = tok + jnp.dot(o, blk["attn"]["o"]["kernel"].astype(o.dtype)) + blk["attn"]["o"]["bias"].astype(o.dtype)
        xn = layer_norm(tok, blk["norm2"]["scale"], blk["norm2"]["bias"])
        m = jnp.dot(_quick_gelu(
            jnp.dot(xn, blk["fc1"]["kernel"].astype(xn.dtype)) + blk["fc1"]["bias"].astype(xn.dtype)),
            blk["fc2"]["kernel"].astype(xn.dtype)) + blk["fc2"]["bias"].astype(xn.dtype)
        tok = tok + m
    return layer_norm(tok, params["post_norm"]["scale"], params["post_norm"]["bias"])


def encode_image(params: Params, cfg: dict, image: np.ndarray) -> jnp.ndarray:
    """[H, W, 3] uint8/0-1 float -> clip_fea [1, 257, D] (resize + CLIP norm)."""
    import cv2

    s = cfg["img_size"]
    x = cv2.resize(np.asarray(image), (s, s)).astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return clip_vision_forward(params, cfg, jnp.asarray(x)[None])
