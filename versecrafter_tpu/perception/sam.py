"""SAM (promptable segmentation), JAX — parity-faithful to the public SAM
architecture so real checkpoints convert 1:1 (validated against the
HuggingFace SamModel at fp32 tolerance with converted weights).

This is the validated backbone for the segmentation capability the reference
consumes through the Grounded-SAM-2 submodule (box-prompted masks,
/root/reference/inference/grounded_sam2_infer.py:188-194). The reference's
actual mask model family is SAM2 (Hiera) — see perception/sam2.py, the
HF-parity-validated port the segmenter uses by default; this SAM1 port is
selectable for SAM-vit checkpoints via
`ImageSegmenter(mask_backend="sam1")` (interchangeable for single-image box
prompts — same `predict_boxes` contract).

Components (exact module math of the public design):
- ViT image encoder: 16x16 patch conv, absolute pos embed, windowed
  attention with decomposed relative positions (global at selected layers),
  conv neck (1x1 -> channels-first LN -> 3x3 -> LN) to 256-d;
- prompt encoder: random-Fourier positional embedding shared with the image
  grid PE; per-type point embeddings; boxes as two labeled corner points;
- mask decoder: two-way transformer (token self-attn, token->image and
  image->token cross-attn at downsample rate 2), transposed-conv 4x
  upscaling, hypernetwork mask heads, IoU head.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

VIT_B = dict(hidden_size=768, depth=12, heads=12, global_layers=(2, 5, 8, 11),
             window=14, patch=16, img_size=1024, out_ch=256, mlp_ratio=4.0)
VIT_H = dict(hidden_size=1280, depth=32, heads=16, global_layers=(7, 15, 23, 31),
             window=14, patch=16, img_size=1024, out_ch=256, mlp_ratio=4.0)
TEST_TINY = dict(hidden_size=32, depth=2, heads=2, global_layers=(1,),
                 window=2, patch=16, img_size=64, out_ch=32, mlp_ratio=2.0)


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _ln_cf(x, p, eps=1e-6):
    """channels-first LayerNorm over dim 1 of NCHW (SamLayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(1, keepdims=True)
    var = ((xf - mu) ** 2).mean(1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)[None, :, None, None]
            + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _lin(p, x):
    return jnp.dot(x, p["weight"].astype(x.dtype)) + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# vision encoder
# ---------------------------------------------------------------------------

def _rel_pos(size: int, table: jnp.ndarray) -> jnp.ndarray:
    """[2*size-1, hd] -> [size, size, hd] for equal q/k sizes."""
    qc = np.arange(size)[:, None]
    kc = np.arange(size)[None, :]
    idx = (qc - kc) + (size - 1)
    return table[jnp.asarray(idx)]


def _vision_attn(p, x, heads: int):
    """x: [B, H, W, C] (a window or the full grid)."""
    b, h, w, c = x.shape
    hd = c // heads
    qkv = _lin(p["qkv"], x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = (t.reshape(b * heads, h * w, hd) for t in qkv)
    attn = jnp.einsum("bqd,bkd->bqk", q * (hd ** -0.5), k)

    rh = _rel_pos(h, p["rel_pos_h"]).astype(q.dtype)
    rw = _rel_pos(w, p["rel_pos_w"]).astype(q.dtype)
    rq = q.reshape(b * heads, h, w, hd)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    attn = attn.reshape(b * heads, h, w, h, w) \
        + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    attn = attn.reshape(b * heads, h * w, h * w)

    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bqk,bkd->bqd", attn, v)
    o = o.reshape(b, heads, h, w, hd).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
    return _lin(p["proj"], o)


def vision_forward(params: Params, cfg: dict, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] (ImageNet-normalized) -> embeddings [B, 256, h, w]."""
    b, H, W, _ = pixels.shape
    ps = cfg["patch"]
    # patch conv as matmul; channel order (3, ps, ps) matches the converter's
    # flatten of the torch conv weight [C, 3, ps, ps]
    x = pixels.reshape(b, H // ps, ps, W // ps, ps, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, H // ps, W // ps, 3 * ps * ps)
    x = jnp.dot(x, params["patch_embed"]["weight"].astype(x.dtype)) \
        + params["patch_embed"]["bias"].astype(x.dtype)
    if "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)

    gh, gw = x.shape[1:3]
    win = cfg["window"]
    for i, blk in enumerate(params["layers"]):
        res = x
        h = _ln(x, blk["layer_norm1"])
        if i not in cfg["global_layers"] and win > 0:
            pad_h = (win - gh % win) % win
            pad_w = (win - gw % win) % win
            hp = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            ph, pw = gh + pad_h, gw + pad_w
            hw = hp.reshape(b, ph // win, win, pw // win, win, -1)
            hw = hw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, hp.shape[-1])
            hw = _vision_attn(blk["attn"], hw, cfg["heads"])
            hw = hw.reshape(b, ph // win, pw // win, win, win, -1)
            hw = hw.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, -1)
            h = hw[:, :gh, :gw]
        else:
            h = _vision_attn(blk["attn"], h, cfg["heads"])
        x = res + h
        h = _ln(x, blk["layer_norm2"])
        h = _lin(blk["mlp"]["lin2"], jax.nn.gelu(_lin(blk["mlp"]["lin1"], h),
                                                 approximate=False))
        x = x + h

    # neck (NCHW convs)
    x = x.transpose(0, 3, 1, 2)
    dn = jax.lax.conv_dimension_numbers(x.shape, params["neck"]["conv1"].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, params["neck"]["conv1"].astype(x.dtype),
                                     (1, 1), "VALID", dimension_numbers=dn)
    x = _ln_cf(x, params["neck"]["layer_norm1"])
    dn = jax.lax.conv_dimension_numbers(x.shape, params["neck"]["conv2"].shape,
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, params["neck"]["conv2"].astype(x.dtype),
                                     (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
    return _ln_cf(x, params["neck"]["layer_norm2"])


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def _fourier_pe(pe_table: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    c = 2.0 * coords01 - 1.0
    proj = 2 * jnp.pi * (c.astype(jnp.float32) @ pe_table.astype(jnp.float32))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)


def encode_prompts(params: Params, cfg: dict,
                   boxes: Optional[jnp.ndarray] = None,
                   points: Optional[jnp.ndarray] = None,
                   labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """boxes [B, Q, 4] xyxy pixels; points [B, Q, P, 2] + labels [B, Q, P]
    -> sparse tokens [B, Q, T, 256]. Point semantics of the public prompt
    encoder: +0.5 pixel shift, padding point with label -1 when no boxes,
    per-type embeddings (0/1 fg-bg, 2/3 box corners), not-a-point for -1."""
    size = cfg["img_size"]
    pe = params["shared_pe"]
    toks = []
    if points is not None:
        pts = points + 0.5
        if boxes is None:
            pad_p = jnp.zeros((*pts.shape[:2], 1, 2), pts.dtype)
            pad_l = -jnp.ones((*pts.shape[:2], 1), labels.dtype)
            pts = jnp.concatenate([pts, pad_p], 2)
            labels = jnp.concatenate([labels, pad_l], 2)
        emb = _fourier_pe(pe, pts / size)
        emb = jnp.where(labels[..., None] == -1,
                        params["not_a_point"].astype(emb.dtype), emb)
        emb = jnp.where((labels == 0)[..., None],
                        emb + params["point_embed"][0].astype(emb.dtype), emb)
        emb = jnp.where((labels == 1)[..., None],
                        emb + params["point_embed"][1].astype(emb.dtype), emb)
        toks.append(emb)
    if boxes is not None:
        corners = (boxes + 0.5).reshape(*boxes.shape[:2], 2, 2)
        emb = _fourier_pe(pe, corners / size)
        emb = emb + jnp.stack([params["point_embed"][2],
                               params["point_embed"][3]]).astype(emb.dtype)
        toks.append(emb)
    return jnp.concatenate(toks, axis=2)


def image_grid_pe(params: Params, h: int, w: int) -> jnp.ndarray:
    """get_image_wide_positional_embeddings: [1, 256, h, w]."""
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), -1)  # [h, w, 2] (x,y)
    pe = _fourier_pe(params["shared_pe"], grid)
    return pe.transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def _attn(p, q, k, v, heads: int):
    """SamAttention over [B*, T, C] with projected internal dim."""
    qp, kp, vp = _lin(p["q_proj"], q), _lin(p["k_proj"], k), _lin(p["v_proj"], v)
    b, nq, ci = qp.shape
    hd = ci // heads
    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = split(qp), split(kp), split(vp)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) * (hd ** -0.5)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh).transpose(0, 2, 1, 3).reshape(b, nq, ci)
    return _lin(p["out_proj"], o)


def _ffw(p, x, depth: int):
    h = jax.nn.relu(_lin(p["proj_in"], x))
    for i in range(depth - 2):
        h = jax.nn.relu(_lin(p["layers"][i], h))
    return _lin(p["proj_out"], h)


def decode_masks(params: Params, cfg: dict, image_embed: jnp.ndarray,
                 sparse: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embed [B, 256, h, w]; sparse [B, Q, T, 256] ->
    (masks [B, Q, n_masks, 4h, 4w], iou [B, Q, n_masks])."""
    dec = params["decoder"]
    B, C, h, w = image_embed.shape
    Q = sparse.shape[1]
    heads = dec["_heads"]
    n_mask = dec["mask_tokens"].shape[0]

    out_tok = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]], 0)
    tokens = jnp.broadcast_to(out_tok[None, None],
                              (B, Q, out_tok.shape[0], C)).astype(sparse.dtype)
    tokens = jnp.concatenate([tokens, sparse], axis=2)
    point_pe = tokens  # the "point embedding" re-added each layer

    dense = params["no_mask_embed"].reshape(1, -1, 1, 1).astype(image_embed.dtype)
    src = (image_embed + dense)
    src = jnp.repeat(src, Q, axis=0).reshape(B * Q, C, h * w).transpose(0, 2, 1)
    img_pe = image_grid_pe(params, h, w).astype(src.dtype)
    img_pe = jnp.broadcast_to(img_pe.reshape(1, C, h * w).transpose(0, 2, 1),
                              src.shape)

    q = tokens.reshape(B * Q, -1, C)
    qpe = point_pe.reshape(B * Q, -1, C)
    for i, ly in enumerate(dec["layers"]):
        if i == 0:
            q = q + _attn(ly["self_attn"], q, q, q, heads)
        else:
            qq = q + qpe
            q = q + _attn(ly["self_attn"], qq, qq, q, heads)
        q = _ln(q, ly["layer_norm1"])
        q = q + _attn(ly["cross_attn_token_to_image"], q + qpe, src + img_pe,
                      src, heads)
        q = _ln(q, ly["layer_norm2"])
        q = q + _lin(ly["mlp"]["lin2"], jax.nn.relu(_lin(ly["mlp"]["lin1"], q)))
        q = _ln(q, ly["layer_norm3"])
        src = src + _attn(ly["cross_attn_image_to_token"], src + img_pe,
                          q + qpe, q, heads)
        src = _ln(src, ly["layer_norm4"])
    q = q + _attn(dec["final_attn"], q + qpe, src + img_pe, src, heads)
    q = _ln(q, dec["layer_norm_final"])

    iou_tok = q[:, 0]
    mask_toks = q[:, 1:1 + n_mask]

    up = src.transpose(0, 2, 1).reshape(B * Q, C, h, w)
    up = jax.lax.conv_transpose(
        up, dec["upscale_conv1"]["weight"].astype(up.dtype), (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
    up = up + dec["upscale_conv1"]["bias"].astype(up.dtype)[None, :, None, None]
    up = jax.nn.gelu(_ln_cf(up, dec["upscale_layer_norm"]), approximate=False)
    up = jax.lax.conv_transpose(
        up, dec["upscale_conv2"]["weight"].astype(up.dtype), (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
    up = up + dec["upscale_conv2"]["bias"].astype(up.dtype)[None, :, None, None]
    up = jax.nn.gelu(up, approximate=False)

    hyper = jnp.stack([
        _ffw(dec["hyper"][i], mask_toks[:, i], 3) for i in range(n_mask)], 1)
    co = up.shape[1]
    masks = jnp.einsum("bmc,bchw->bmhw", hyper,
                       up.reshape(B * Q, co, 4 * h, 4 * w))
    iou = _ffw(dec["iou_head"], iou_tok, dec["_iou_depth"])
    return (masks.reshape(B, Q, n_mask, 4 * h, 4 * w),
            iou.reshape(B, Q, n_mask))


def predict_boxes(params: Params, cfg: dict, pixels: jnp.ndarray,
                  boxes: jnp.ndarray, multimask_output: bool = True):
    """One-call box-prompted prediction with the same contract as
    perception.sam2.predict_boxes (pixels [B, H, W, 3] normalized, boxes
    [B, Q, 4] xyxy input-image pixels) so the segmenter can select either
    mask family via `mask_backend`. SAM1 token semantics: token 0 is the
    single-mask output, tokens 1..3 are the multimask outputs. Returns
    (masks, iou, None) — SAM1 has no object-score head."""
    embeds = vision_forward(params, cfg, pixels)
    sparse = encode_prompts(params, cfg, boxes=boxes)
    masks, iou = decode_masks(params, cfg, embeds, sparse)
    if multimask_output:
        return masks[:, :, 1:], iou[:, :, 1:], None
    return masks[:, :, :1], iou[:, :, :1], None


_SAM_JIT: dict = {}


def predict_boxes_jit(params: Params, cfg: dict, pixels, boxes,
                      multimask_output: bool = True):
    """Cached jitted predict_boxes (same rationale as
    sam2.predict_boxes_jit: eager per-op dispatch is ruinous over the axon
    tunnel). The decoder's "_heads"/"_iou_depth" int leaves are STATIC
    config smuggled through the params tree — jit would trace them into
    shape arithmetic, so they're stripped from the traced tree and closed
    over instead."""
    statics = {k: v for k, v in params["decoder"].items()
               if k.startswith("_")}
    key = (tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in cfg.items())), bool(multimask_output),
        tuple(sorted(statics.items())))
    if key not in _SAM_JIT:
        def fn(p, px, bx, _cfg=dict(cfg), _m=bool(multimask_output),
               _s=dict(statics)):
            p = dict(p, decoder={**p["decoder"], **_s})
            return predict_boxes(p, _cfg, px, bx, _m)
        _SAM_JIT[key] = jax.jit(fn)
    stripped = dict(params, decoder={
        k: v for k, v in params["decoder"].items()
        if not k.startswith("_")})
    return _SAM_JIT[key](stripped, pixels, boxes)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_hf_sam(state_dict, cfg: dict, dtype=jnp.float32,
                   decoder_heads: int = 8) -> Params:
    """Convert a HuggingFace SamModel state_dict into this module's pytree."""
    def g(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t)

    def lin(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight").T, dtype),
                "bias": jnp.asarray(g(f"{prefix}.bias"), dtype)}

    def lnp(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight"), jnp.float32),
                "bias": jnp.asarray(g(f"{prefix}.bias"), jnp.float32)}

    pw = g("vision_encoder.patch_embed.projection.weight")  # [C, 3, ps, ps]
    params: Params = {
        "patch_embed": {
            "weight": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
            "bias": jnp.asarray(g("vision_encoder.patch_embed.projection.bias"), dtype),
        },
        "layers": [],
        "neck": {
            "conv1": jnp.asarray(g("vision_encoder.neck.conv1.weight"), dtype),
            "layer_norm1": lnp("vision_encoder.neck.layer_norm1"),
            "conv2": jnp.asarray(g("vision_encoder.neck.conv2.weight"), dtype),
            "layer_norm2": lnp("vision_encoder.neck.layer_norm2"),
        },
        "shared_pe": jnp.asarray(
            g("shared_image_embedding.positional_embedding"), jnp.float32),
        "point_embed": jnp.asarray(np.stack([
            g(f"prompt_encoder.point_embed.{i}.weight")[0] for i in range(4)]),
            dtype),
        "not_a_point": jnp.asarray(
            g("prompt_encoder.not_a_point_embed.weight")[0], dtype),
        "no_mask_embed": jnp.asarray(
            g("prompt_encoder.no_mask_embed.weight")[0], dtype),
    }
    if "vision_encoder.pos_embed" in state_dict:
        params["pos_embed"] = jnp.asarray(g("vision_encoder.pos_embed"), dtype)
    for i in range(cfg["depth"]):
        pre = f"vision_encoder.layers.{i}"
        params["layers"].append({
            "layer_norm1": lnp(f"{pre}.layer_norm1"),
            "layer_norm2": lnp(f"{pre}.layer_norm2"),
            "attn": {
                "qkv": lin(f"{pre}.attn.qkv"),
                "proj": lin(f"{pre}.attn.proj"),
                "rel_pos_h": jnp.asarray(g(f"{pre}.attn.rel_pos_h"), dtype),
                "rel_pos_w": jnp.asarray(g(f"{pre}.attn.rel_pos_w"), dtype),
            },
            "mlp": {"lin1": lin(f"{pre}.mlp.lin1"), "lin2": lin(f"{pre}.mlp.lin2")},
        })

    def attn_p(prefix):
        return {k: lin(f"{prefix}.{k}") for k in
                ("q_proj", "k_proj", "v_proj", "out_proj")}

    md = "mask_decoder"
    iou_depth = 1
    while f"{md}.iou_prediction_head.layers.{iou_depth - 1}.weight" in state_dict:
        iou_depth += 1
    dec = {
        "iou_token": jnp.asarray(g(f"{md}.iou_token.weight"), dtype),
        "mask_tokens": jnp.asarray(g(f"{md}.mask_tokens.weight"), dtype),
        "layers": [],
        "final_attn": attn_p(f"{md}.transformer.final_attn_token_to_image"),
        "layer_norm_final": lnp(f"{md}.transformer.layer_norm_final_attn"),
        "upscale_conv1": {"weight": jnp.asarray(g(f"{md}.upscale_conv1.weight"), dtype),
                          "bias": jnp.asarray(g(f"{md}.upscale_conv1.bias"), dtype)},
        "upscale_conv2": {"weight": jnp.asarray(g(f"{md}.upscale_conv2.weight"), dtype),
                          "bias": jnp.asarray(g(f"{md}.upscale_conv2.bias"), dtype)},
        "upscale_layer_norm": lnp(f"{md}.upscale_layer_norm"),
        "hyper": [],
        "iou_head": {
            "proj_in": lin(f"{md}.iou_prediction_head.proj_in"),
            "proj_out": lin(f"{md}.iou_prediction_head.proj_out"),
            "layers": [lin(f"{md}.iou_prediction_head.layers.{j}")
                       for j in range(iou_depth - 1)],
        },
        "_heads": decoder_heads,
        "_iou_depth": iou_depth + 1,
    }
    n_mask = dec["mask_tokens"].shape[0]
    for i in range(n_mask):
        pre = f"{md}.output_hypernetworks_mlps.{i}"
        dec["hyper"].append({
            "proj_in": lin(f"{pre}.proj_in"),
            "proj_out": lin(f"{pre}.proj_out"),
            "layers": [lin(f"{pre}.layers.{j}")
                       for j in range(1)],
        })
    li = 0
    while f"{md}.transformer.layers.{li}.layer_norm1.weight" in state_dict:
        pre = f"{md}.transformer.layers.{li}"
        dec["layers"].append({
            "self_attn": attn_p(f"{pre}.self_attn"),
            "layer_norm1": lnp(f"{pre}.layer_norm1"),
            "cross_attn_token_to_image": attn_p(f"{pre}.cross_attn_token_to_image"),
            "layer_norm2": lnp(f"{pre}.layer_norm2"),
            "mlp": {"lin1": lin(f"{pre}.mlp.lin1"), "lin2": lin(f"{pre}.mlp.lin2")},
            "layer_norm3": lnp(f"{pre}.layer_norm3"),
            "cross_attn_image_to_token": attn_p(f"{pre}.cross_attn_image_to_token"),
            "layer_norm4": lnp(f"{pre}.layer_norm4"),
        })
        li += 1
    params["decoder"] = dec
    return params
