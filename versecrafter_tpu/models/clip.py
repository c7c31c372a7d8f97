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
    (cls first — the 257 tokens the i2v cross-attention consumes).

    cfg["post_norm"] (default True) applies the final layernorm to ALL
    tokens; the HF CLIPVisionModel's last_hidden_state omits it
    (post_layernorm is applied to the pooled CLS only), so HF-parity tests
    run with post_norm=False. cfg["ln_eps"] defaults to the CLIP 1e-5."""
    eps = cfg.get("ln_eps", 1e-5)
    b, h, w, _ = image.shape
    p = cfg["patch"]
    x = image.reshape(b, h // p, p, w // p, p, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, (h // p) * (w // p), 3 * p * p)
    tok = jnp.dot(x, params["patch_embed"]["kernel"].astype(x.dtype))
    cls = jnp.broadcast_to(params["cls"].astype(tok.dtype), (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], 1)
    tok = tok + params["pos"][:, : tok.shape[1]].astype(tok.dtype)
    tok = layer_norm(tok, params["pre_norm"]["scale"], params["pre_norm"]["bias"],
                     eps=eps)

    heads = cfg["heads"]
    d = tok.shape[-1]
    hd = d // heads
    for blk in params["blocks"]:
        xn = layer_norm(tok, blk["norm1"]["scale"], blk["norm1"]["bias"],
                        eps=eps)
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
        xn = layer_norm(tok, blk["norm2"]["scale"], blk["norm2"]["bias"],
                        eps=eps)
        m = jnp.dot(_quick_gelu(
            jnp.dot(xn, blk["fc1"]["kernel"].astype(xn.dtype)) + blk["fc1"]["bias"].astype(xn.dtype)),
            blk["fc2"]["kernel"].astype(xn.dtype)) + blk["fc2"]["bias"].astype(xn.dtype)
        tok = tok + m
    if not cfg.get("post_norm", True):
        return tok
    return layer_norm(tok, params["post_norm"]["scale"],
                      params["post_norm"]["bias"], eps=eps)


def encode_image(params: Params, cfg: dict, image: np.ndarray) -> jnp.ndarray:
    """[H, W, 3] uint8/0-1 float -> clip_fea [1, 257, D] (resize + CLIP norm)."""
    import cv2

    s = cfg["img_size"]
    x = cv2.resize(np.asarray(image), (s, s)).astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return clip_vision_forward(params, cfg, jnp.asarray(x)[None])


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().float().numpy()
                      if hasattr(t, "detach") else t)


def convert_clip_vision(state_dict, cfg: dict = None, dtype=jnp.float32,
                        heads: int = None):
    """Convert a CLIP vision tower checkpoint into this module's pytree.

    Two public layouts are auto-detected (the reference's
    models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth follows the
    open-clip convention; the videox_fun loader itself is in the absent
    submodule, so the mapping is validated by tiny-config parity vs the HF
    CLIPVisionModel and a synthetic open-clip relayout of the same weights):

    - HuggingFace `CLIPVisionModel`: vision_model.embeddings.*,
      vision_model.encoder.layers.{i}.self_attn.{q,k,v,out}_proj /
      layer_norm1/2 / mlp.fc1/fc2, pre/post layernorm;
    - open-clip / torch-MHA: visual.conv1, visual.class_embedding,
      visual.positional_embedding, visual.ln_pre/ln_post,
      visual.transformer.resblocks.{i}.ln_1/ln_2, attn.in_proj_* (packed
      qkv), attn.out_proj, mlp.c_fc/c_proj.

    Returns (params, cfg). `heads` is not recoverable from weights; the
    default covers the standard CLIP vision towers (ViT-B 768->12,
    ViT-L 1024->16, ViT-H 1280->16, ViT-G 1664->16), falling back to
    64-dim heads — pass `heads=` explicitly for exotic widths."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    hf = any(k.startswith("vision_model.") for k in sd)

    if hf:
        conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
        cls = _np(sd["vision_model.embeddings.class_embedding"])
        pos = _np(sd["vision_model.embeddings.position_embedding.weight"])
        pre = "vision_model.pre_layrnorm" if \
            "vision_model.pre_layrnorm.weight" in sd else "vision_model.pre_layernorm"
        post = "vision_model.post_layernorm"
        nblk = len({k.split(".")[3] for k in sd
                    if k.startswith("vision_model.encoder.layers.")})
        blk_fmt = "vision_model.encoder.layers.{i}."
    else:
        conv = _np(sd["visual.conv1.weight"])
        cls = _np(sd["visual.class_embedding"])
        pos = _np(sd["visual.positional_embedding"])
        pre, post = "visual.ln_pre", "visual.ln_post"
        nblk = len({k.split(".")[3] for k in sd
                    if k.startswith("visual.transformer.resblocks.")})
        blk_fmt = "visual.transformer.resblocks.{i}."

    d, _, p, _ = conv.shape
    n_tok = pos.shape[0]
    img = int(round((n_tok - 1) ** 0.5)) * p
    # standard CLIP towers: ViT-B 768/12, ViT-L 1024/16, ViT-H 1280/16,
    # ViT-G 1664/16; otherwise 64-dim heads (d//80 broke every d not
    # divisible by 80: 1024 -> 12 heads -> 1024/12 reshape error)
    default_heads = {768: 12, 1024: 16, 1280: 16, 1664: 16}.get(
        d, max(1, d // 64))
    cfg = cfg or dict(patch=p, dim=d, depth=nblk,
                      heads=heads or default_heads, img_size=img)

    def ln(name):
        return {"scale": jnp.asarray(_np(sd[name + ".weight"]), jnp.float32),
                "bias": jnp.asarray(_np(sd[name + ".bias"]), jnp.float32)}

    def lin(wname, bname=None):
        w = _np(sd[wname]).T
        out = {"kernel": jnp.asarray(w, dtype)}
        if bname and bname in sd:
            out["bias"] = jnp.asarray(_np(sd[bname]), dtype)
        return out

    # conv [D, 3, p, p] -> [3*p*p, D] in (c, py, px) patch order (the
    # forward's reshape order)
    params: Params = {
        "patch_embed": {"kernel": jnp.asarray(
            conv.reshape(d, 3 * p * p).T, dtype)},
        "cls": jnp.asarray(cls.reshape(1, 1, d), dtype),
        "pos": jnp.asarray(pos.reshape(1, n_tok, d), dtype),
        "pre_norm": ln(pre),
        "post_norm": ln(post),
        "blocks": [],
    }
    for i in range(nblk):
        pre_i = blk_fmt.format(i=i)
        if hf:
            attn = {
                "q": lin(pre_i + "self_attn.q_proj.weight",
                         pre_i + "self_attn.q_proj.bias"),
                "k": lin(pre_i + "self_attn.k_proj.weight",
                         pre_i + "self_attn.k_proj.bias"),
                "v": lin(pre_i + "self_attn.v_proj.weight",
                         pre_i + "self_attn.v_proj.bias"),
                "o": lin(pre_i + "self_attn.out_proj.weight",
                         pre_i + "self_attn.out_proj.bias"),
            }
            blk = {
                "norm1": ln(pre_i + "layer_norm1"),
                "norm2": ln(pre_i + "layer_norm2"),
                "attn": attn,
                "fc1": lin(pre_i + "mlp.fc1.weight", pre_i + "mlp.fc1.bias"),
                "fc2": lin(pre_i + "mlp.fc2.weight", pre_i + "mlp.fc2.bias"),
            }
        else:
            w = _np(sd[pre_i + "attn.in_proj_weight"])  # [3D, D] packed
            bqkv = _np(sd[pre_i + "attn.in_proj_bias"])
            attn = {}
            for j, nme in enumerate("qkv"):
                attn[nme] = {"kernel": jnp.asarray(w[j * d:(j + 1) * d].T, dtype),
                             "bias": jnp.asarray(bqkv[j * d:(j + 1) * d], dtype)}
            attn["o"] = lin(pre_i + "attn.out_proj.weight",
                            pre_i + "attn.out_proj.bias")
            blk = {
                "norm1": ln(pre_i + "ln_1"),
                "norm2": ln(pre_i + "ln_2"),
                "attn": attn,
                "fc1": lin(pre_i + "mlp.c_fc.weight", pre_i + "mlp.c_fc.bias"),
                "fc2": lin(pre_i + "mlp.c_proj.weight", pre_i + "mlp.c_proj.bias"),
            }
        params["blocks"].append(blk)
    return params, cfg
