"""GroundingDINO-style open-vocabulary detection, JAX.

TPU-native replacement for the Grounded-SAM-2 submodule's GroundingDINO
(text-prompted boxes consumed at /root/reference/inference/
grounded_sam2_infer.py:143-150). Architecture follows the public design:

- **Swin** backbone (shifted-window attention, patch merging) giving
  multi-scale features (strides 8/16/32 + a stride-64 projection);
- **text encoder**: BERT-style transformer over sub-word tokens;
- **feature enhancer**: deformable self-attention on the flattened
  multi-scale image tokens interleaved with image<->text cross attention;
- **language-guided query selection**: top-K proposals by max text-token
  similarity;
- **decoder**: per-layer self-attn + text cross-attn + deformable
  cross-attn with iterative box refinement; class logits are dot products
  with text features (open vocabulary).

Deformable attention is expressed as bilinear gathers + matmuls (the
MSDeformAttn CUDA op's math, SURVEY.md §2.3) — dense XLA, no custom op.
Random-weight shape-tested; numerics validate when weights are converted.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from versecrafter_tpu.kernels.norms import layer_norm

Params = Dict[str, Any]

SWIN_T = dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), window=7)
TEST_TINY = dict(embed_dim=16, depths=(1, 1, 1, 1), heads=(1, 2, 2, 2), window=4)


def _dense(key, cin, cout, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (cin, cout))
                    * (2.0 / (cin + cout)) ** 0.5).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _mk_ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _apply(p, x):
    y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _mha(p, q, k, v, heads, mask=None):
    b, nq, d = q.shape
    hd = d // heads
    qh = _apply(p["q"], q).reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = _apply(p["k"], k).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = _apply(p["v"], v).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e9)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return _apply(p["o"], o)


# ---------------------------------------------------------------------------
# Swin backbone
# ---------------------------------------------------------------------------

def init_swin(key, cfg: dict, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 512))
    nk = lambda: next(ks)
    dim = cfg["embed_dim"]
    params: Params = {"patch_embed": _dense(nk(), 3 * 4 * 4, dim, dtype),
                      "patch_norm": _mk_ln(dim), "stages": []}
    cur = dim
    for si, depth in enumerate(cfg["depths"]):
        stage = {"blocks": []}
        for _ in range(depth):
            stage["blocks"].append({
                "norm1": _mk_ln(cur),
                "attn": {k: _dense(nk(), cur, cur, dtype) for k in "qkvo"},
                "norm2": _mk_ln(cur),
                "fc1": _dense(nk(), cur, 4 * cur, dtype),
                "fc2": _dense(nk(), 4 * cur, cur, dtype),
            })
        if si < len(cfg["depths"]) - 1:
            stage["merge"] = {"norm": _mk_ln(4 * cur),
                              "proj": _dense(nk(), 4 * cur, 2 * cur, dtype, bias=False)}
        params["stages"].append(stage)
        cur *= 2
    return params


def _swin_window_attn(b, x, heads, window, shift):
    B, H, W, C = x.shape
    if shift:
        x = jnp.roll(x, (-window // 2, -window // 2), (1, 2))
    win = min(window, H, W)
    xw = x.reshape(B, H // win, win, W // win, win, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)
    o = _mha(b["attn"], xw, xw, xw, heads)
    o = o.reshape(B, H // win, W // win, win, win, C)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if shift:
        o = jnp.roll(o, (window // 2, window // 2), (1, 2))
    return o


def swin_forward(params: Params, cfg: dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [B, H, W, 3] -> stage features (strides 4, 8, 16, 32)."""
    B, H, W, _ = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (4, 4), (4, 4), "VALID").transpose(0, 2, 3, 1)
    h = _apply(params["patch_embed"], patches)
    h = layer_norm(h, params["patch_norm"]["scale"], params["patch_norm"]["bias"])

    feats = []
    for si, stage in enumerate(params["stages"]):
        for bi, b in enumerate(stage["blocks"]):
            hn = layer_norm(h, b["norm1"]["scale"], b["norm1"]["bias"])
            h = h + _swin_window_attn(b, hn, cfg["heads"][si],
                                      cfg["window"], shift=bool(bi % 2))
            hn = layer_norm(h, b["norm2"]["scale"], b["norm2"]["bias"])
            h = h + _apply(b["fc2"], jax.nn.gelu(_apply(b["fc1"], hn)))
        feats.append(h)
        if "merge" in stage:
            Bh, Hh, Wh, C = h.shape
            m = h.reshape(Bh, Hh // 2, 2, Wh // 2, 2, C)
            m = m.transpose(0, 1, 3, 2, 4, 5).reshape(Bh, Hh // 2, Wh // 2, 4 * C)
            m = layer_norm(m, stage["merge"]["norm"]["scale"],
                           stage["merge"]["norm"]["bias"])
            h = _apply(stage["merge"]["proj"], m)
    return feats


# ---------------------------------------------------------------------------
# text encoder (BERT-style)
# ---------------------------------------------------------------------------

def init_text_encoder(key, vocab=30522, dim=256, layers=3, heads=4,
                      max_len=256, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    nk = lambda: next(ks)
    return {
        "tok_embed": (jax.random.normal(nk(), (vocab, dim)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(nk(), (max_len, dim)) * 0.02).astype(dtype),
        "norm_in": _mk_ln(dim),
        "layers": [{
            "attn": {k: _dense(nk(), dim, dim, dtype) for k in "qkvo"},
            "norm1": _mk_ln(dim),
            "fc1": _dense(nk(), dim, 4 * dim, dtype),
            "fc2": _dense(nk(), 4 * dim, dim, dtype),
            "norm2": _mk_ln(dim),
        } for _ in range(layers)],
        "_heads": None,
    }


def text_forward(params: Params, ids: jnp.ndarray, mask: jnp.ndarray,
                 heads=4) -> jnp.ndarray:
    x = params["tok_embed"][ids] + params["pos_embed"][: ids.shape[1]][None]
    x = layer_norm(x, params["norm_in"]["scale"], params["norm_in"]["bias"])
    for ly in params["layers"]:
        x = x + _mha(ly["attn"], x, x, x, heads, mask=mask > 0)
        x = layer_norm(x, ly["norm1"]["scale"], ly["norm1"]["bias"])
        x = x + _apply(ly["fc2"], jax.nn.gelu(_apply(ly["fc1"], x)))
        x = layer_norm(x, ly["norm2"]["scale"], ly["norm2"]["bias"])
    return x * mask[..., None].astype(x.dtype)


# ---------------------------------------------------------------------------
# deformable attention (bilinear gather + matmul)
# ---------------------------------------------------------------------------

def deformable_attention(p: Params, query: jnp.ndarray, ref_points: jnp.ndarray,
                         value: jnp.ndarray, shapes: List[Tuple[int, int]],
                         heads: int = 8, n_points: int = 4) -> jnp.ndarray:
    """MSDeformAttn math without the CUDA op.

    query [B, Q, D]; ref_points [B, Q, 2] normalized (x, y);
    value [B, sum(HW), D] over `shapes` levels.
    Offsets/weights are linear heads of the query; sampling is bilinear
    gathers from each level's value map."""
    B, Q, D = query.shape
    L = len(shapes)
    hd = D // heads
    off = _apply(p["offsets"], query).reshape(B, Q, heads, L, n_points, 2)
    w = _apply(p["weights"], query).reshape(B, Q, heads, L * n_points)
    w = jax.nn.softmax(w.astype(jnp.float32), -1).astype(query.dtype)
    v = _apply(p["value"], value)

    out = jnp.zeros((B, Q, heads, hd), query.dtype)
    start = 0
    for li, (h, wd) in enumerate(shapes):
        lvl = v[:, start:start + h * wd].reshape(B, h, wd, heads, hd)
        start += h * wd
        # sampling locations in this level's pixel units
        loc = ref_points[:, :, None, None, :] \
            + off[:, :, :, li] / jnp.asarray([wd, h], query.dtype)
        x = loc[..., 0] * wd - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, wd - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, wd - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        fx = jnp.clip(x - x0, 0, 1)[..., None]
        fy = jnp.clip(y - y0, 0, 1)[..., None]

        # per-batch vmap gather on flattened maps
        flat = lvl.reshape(B, h * wd, heads * hd)
        def g1(fm, idx):
            return fm[idx]
        idx00 = (y0 * wd + x0).reshape(B, -1)
        idx01 = (y0 * wd + x1).reshape(B, -1)
        idx10 = (y1 * wd + x0).reshape(B, -1)
        idx11 = (y1 * wd + x1).reshape(B, -1)
        s00 = jax.vmap(g1)(flat, idx00).reshape(B, Q, heads, n_points, heads, hd)
        s01 = jax.vmap(g1)(flat, idx01).reshape(B, Q, heads, n_points, heads, hd)
        s10 = jax.vmap(g1)(flat, idx10).reshape(B, Q, heads, n_points, heads, hd)
        s11 = jax.vmap(g1)(flat, idx11).reshape(B, Q, heads, n_points, heads, hd)
        # select this head's channels: diag over the two head axes
        hsel = jnp.arange(heads)
        s00, s01, s10, s11 = (s[:, :, hsel, :, hsel].transpose(1, 2, 0, 3, 4)
                              for s in (s00, s01, s10, s11))
        fx_ = fx
        fy_ = fy
        samp = ((1 - fx_) * (1 - fy_) * s00 + fx_ * (1 - fy_) * s01
                + (1 - fx_) * fy_ * s10 + fx_ * fy_ * s11)  # [B,Q,heads,P,hd]
        wl = w[..., li * n_points:(li + 1) * n_points]
        out = out + jnp.einsum("bqhpd,bqhp->bqhd", samp, wl)
    return _apply(p["out"], out.reshape(B, Q, D))


def _init_deform(key, d, dtype, heads=8, levels=3, n_points=4):
    ks = jax.random.split(key, 4)
    return {
        "offsets": _dense(ks[0], d, heads * levels * n_points * 2, dtype),
        "weights": _dense(ks[1], d, heads * levels * n_points, dtype),
        "value": _dense(ks[2], d, d, dtype),
        "out": _dense(ks[3], d, d, dtype),
    }


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_gdino(key, swin_cfg: dict = SWIN_T, d: int = 256,
               enhancer_layers: int = 2, decoder_layers: int = 2,
               num_queries: int = 100, text_dim: int = 256,
               dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 256))
    nk = lambda: next(ks)
    dims = [swin_cfg["embed_dim"] * 2 ** i for i in (1, 2, 3)]  # strides 8/16/32

    def enh_layer():
        return {
            "deform": _init_deform(nk(), d, dtype),
            "norm1": _mk_ln(d),
            "i2t": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm_i2t": _mk_ln(d),
            "t2i": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm_t2i": _mk_ln(d),
            "tattn": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm_t": _mk_ln(d),
            "fc1": _dense(nk(), d, 4 * d, dtype),
            "fc2": _dense(nk(), 4 * d, d, dtype),
            "norm2": _mk_ln(d),
        }

    def dec_layer():
        return {
            "self": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm1": _mk_ln(d),
            "text": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm2": _mk_ln(d),
            "deform": _init_deform(nk(), d, dtype),
            "norm3": _mk_ln(d),
            "fc1": _dense(nk(), d, 4 * d, dtype),
            "fc2": _dense(nk(), 4 * d, d, dtype),
            "norm4": _mk_ln(d),
            "box_mlp": [_dense(nk(), d, d, dtype), _dense(nk(), d, d, dtype),
                        _dense(nk(), d, 4, dtype)],
        }

    return {
        "swin": init_swin(nk(), swin_cfg, dtype),
        "text": init_text_encoder(nk(), dim=d, dtype=dtype),
        "input_proj": [_dense(nk(), c, d, dtype) for c in dims],
        "level_embed": (jax.random.normal(nk(), (3, d)) * 0.02).astype(dtype),
        "enhancer": [enh_layer() for _ in range(enhancer_layers)],
        "enc_box_mlp": [_dense(nk(), d, d, dtype), _dense(nk(), d, 4, dtype)],
        "decoder": [dec_layer() for _ in range(decoder_layers)],
        "_static": {"swin": None, "num_queries": num_queries},
    }


def gdino_forward(params: Params, swin_cfg: dict, image: jnp.ndarray,
                  text_ids: jnp.ndarray, text_mask: jnp.ndarray,
                  num_queries: int = 100):
    """image [B, H, W, 3] (H, W divisible by 32 and window*4),
    text_ids/mask [B, T] -> (boxes [B, Q, 4] cxcywh normalized,
    logits [B, Q, T] per-text-token similarity)."""
    B = image.shape[0]
    feats = swin_forward(params["swin"], swin_cfg, image)[1:]  # strides 8/16/32
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    toks = []
    for f, proj, lv in zip(feats, params["input_proj"], params["level_embed"]):
        toks.append(_apply(proj, f).reshape(B, -1, proj["kernel"].shape[1])
                    + lv[None, None].astype(f.dtype))
    src = jnp.concatenate(toks, axis=1)

    # reference points = each token's normalized center
    refs = []
    for (h, w) in shapes:
        yy, xx = jnp.mgrid[0:h, 0:w]
        refs.append(jnp.stack([(xx.reshape(-1) + 0.5) / w,
                               (yy.reshape(-1) + 0.5) / h], -1))
    ref_points = jnp.broadcast_to(jnp.concatenate(refs, 0)[None],
                                  (B, src.shape[1], 2)).astype(src.dtype)

    txt = text_forward(params["text"], text_ids, text_mask)

    for ly in params["enhancer"]:
        src = src + deformable_attention(ly["deform"], src, ref_points, src, shapes)
        src = layer_norm(src, ly["norm1"]["scale"], ly["norm1"]["bias"])
        src = src + _mha(ly["i2t"], src, txt, txt, 4, mask=text_mask > 0)
        src = layer_norm(src, ly["norm_i2t"]["scale"], ly["norm_i2t"]["bias"])
        txt = txt + _mha(ly["t2i"], txt, src, src, 4)
        txt = layer_norm(txt, ly["norm_t2i"]["scale"], ly["norm_t2i"]["bias"])
        txt = txt + _mha(ly["tattn"], txt, txt, txt, 4, mask=text_mask > 0)
        txt = layer_norm(txt, ly["norm_t"]["scale"], ly["norm_t"]["bias"])
        src = src + _apply(ly["fc2"], jax.nn.relu(_apply(ly["fc1"], src)))
        src = layer_norm(src, ly["norm2"]["scale"], ly["norm2"]["bias"])

    # language-guided query selection: top-K tokens by max text similarity
    sim = jnp.einsum("bnd,btd->bnt", src, txt)
    sim = jnp.where(text_mask[:, None, :] > 0, sim, -1e9)
    score = sim.max(-1)
    top = jax.lax.top_k(score, num_queries)[1]  # [B, Q]
    q = jnp.take_along_axis(src, top[..., None], 1)
    qref = jnp.take_along_axis(ref_points, top[..., None], 1)

    hb = q
    for lyr in params["enc_box_mlp"][:-1]:
        hb = jax.nn.relu(_apply(lyr, hb))
    delta = _apply(params["enc_box_mlp"][-1], hb)
    boxes = jax.nn.sigmoid(
        delta + jnp.concatenate([jax.scipy.special.logit(jnp.clip(qref, 1e-4, 1 - 1e-4)),
                                 jnp.zeros_like(qref)], -1))

    for ly in params["decoder"]:
        q = q + _mha(ly["self"], q, q, q, 8)
        q = layer_norm(q, ly["norm1"]["scale"], ly["norm1"]["bias"])
        q = q + _mha(ly["text"], q, txt, txt, 8, mask=text_mask > 0)
        q = layer_norm(q, ly["norm2"]["scale"], ly["norm2"]["bias"])
        q = q + deformable_attention(ly["deform"], q, boxes[..., :2], src, shapes)
        q = layer_norm(q, ly["norm3"]["scale"], ly["norm3"]["bias"])
        q = q + _apply(ly["fc2"], jax.nn.relu(_apply(ly["fc1"], q)))
        q = layer_norm(q, ly["norm4"]["scale"], ly["norm4"]["bias"])
        hb = q
        for i, lyr in enumerate(ly["box_mlp"]):
            hb = _apply(lyr, hb)
            if i < len(ly["box_mlp"]) - 1:
                hb = jax.nn.relu(hb)
        boxes = jax.nn.sigmoid(
            hb + jax.scipy.special.logit(jnp.clip(boxes, 1e-4, 1 - 1e-4)))

    logits = jnp.einsum("bqd,btd->bqt", q, txt) / math.sqrt(q.shape[-1])
    logits = jnp.where(text_mask[:, None, :] > 0, logits, -1e9)
    return boxes, logits
