"""SAM2 (promptable segmentation, Hiera), JAX — parity-faithful to the
public SAM2 architecture so real checkpoints convert 1:1 (validated against
the HuggingFace Sam2Model at fp32 tolerance with converted weights,
tests/test_sam2_parity.py).

This is the mask model family the reference actually uses
(/root/reference/inference/grounded_sam2_infer.py:28-31,188-194 — SAM2.1
Hiera box-prompted masks); perception/sam.py remains as the SAM1 variant.

Components (exact module math of the public design):
- **HieraDet** hierarchical encoder: conv patch embed (k7 s4 p3), windowed
  background pos-embed + tiled window pos-embed, multi-scale blocks with
  fused qkv, per-stage window sizes, query max-pooling at stage boundaries
  (channel doubling via a skip `proj`), global attention at selected blocks;
- **FPN neck**: per-level 1x1 convs to 256-d with nearest top-down fusion at
  the configured levels; the three finest levels feed the decoder (the two
  high-res ones pre-projected by the decoder's conv_s0/conv_s1);
- **prompt encoder**: random-Fourier point PE shared with the image-wide
  grid PE; a single 4-slot point-type embedding; boxes as two labeled
  corners plus a padding corner;
- **mask decoder**: [object-score | IoU | 4 mask] tokens + sparse prompts
  through a two-way transformer (downsample-rate-2 cross attention),
  transposed-conv 4x upscale with high-res skip additions, hypernetwork
  mask heads, sigmoid IoU head, object-score head, and the
  stability-based dynamic single-mask selection.

Functional style mirrors perception/sam.py: plain param pytrees, NHWC
activations, torch-layout conv kernels.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# SAM 2.1 Hiera configurations (HF Sam2HieraDetConfig defaults)
HIERA_TINY = dict(
    embed_dims=(96, 192, 384, 768), heads=(1, 2, 4, 8), blocks=(1, 2, 7, 2),
    window_sizes=(8, 4, 14, 7), global_blocks=(5, 7, 9), q_stride=2,
    q_pool_stages=3, window_pe_bg=(7, 7), patch_kernel=7, patch_stride=4,
    patch_pad=3, fpn_hidden=256, num_levels=3, fpn_top_down=(2, 3),
    image_size=1024, prompt_patch=16, dec_heads=8, dec_layers=2,
    dec_mlp=2048, dec_downsample=2, num_mask_tokens=4,
    stability_delta=0.05, stability_thresh=0.98)
HIERA_LARGE = dict(HIERA_TINY, embed_dims=(144, 288, 576, 1152),
                   heads=(2, 4, 8, 16), blocks=(2, 6, 36, 4),
                   window_sizes=(8, 4, 16, 8), global_blocks=(23, 33, 43))
TEST_TINY = dict(
    embed_dims=(16, 32, 64, 128), heads=(1, 2, 2, 4), blocks=(1, 1, 1, 1),
    window_sizes=(4, 4, 4, 4), global_blocks=(2,), q_stride=2,
    q_pool_stages=3, window_pe_bg=(7, 7), patch_kernel=7, patch_stride=4,
    patch_pad=3, fpn_hidden=32, num_levels=3, fpn_top_down=(2, 3),
    image_size=128, prompt_patch=16, dec_heads=2, dec_layers=2,
    dec_mlp=64, dec_downsample=2, num_mask_tokens=4,
    stability_delta=0.05, stability_thresh=0.98)


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _lin(p, x):
    return jnp.dot(x, p["weight"].astype(x.dtype)) + p["bias"].astype(x.dtype)


def _conv(p, x, stride=1, pad=0):
    """NHWC conv with torch [O, I, kh, kw] kernel."""
    k = p["weight"].astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "OIHW", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn)
    return y + p["bias"].astype(y.dtype)


def _conv_transpose2x2(p, x):
    """ConvTranspose2d(k=2, s=2), torch [I, O, 2, 2] kernel (kernel==stride:
    einsum + reshape)."""
    w = p["weight"].astype(x.dtype)
    b, h, ww, _ = x.shape
    y = jnp.einsum("bhwi,ioac->bhawco", x, w).reshape(
        b, h * 2, ww * 2, w.shape[1])
    return y + p["bias"].astype(y.dtype)


def _mlp(p, x, act):
    """Sam2FeedForward: proj_in -> act -> [layers -> act]* -> proj_out."""
    h = act(_lin(p["proj_in"], x))
    for layer in p.get("layers", []):
        h = act(_lin(layer, h))
    return _lin(p["proj_out"], h)


# ---------------------------------------------------------------------------
# HieraDet backbone
# ---------------------------------------------------------------------------

def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp))


def _window_unpartition(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // ((hp // ws) * (wp // ws))
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _max_pool2x2(x, stride):
    b, h, w, c = x.shape
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID")


def _attention(q, k, v, heads):
    """[B, N, H*hd] tokens -> standard softmax attention (fp32 softmax)."""
    b, nq, d = q.shape
    hd = d // heads
    qh = q.reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, nq, d)


def _block_layout(cfg) -> List[dict]:
    """Static per-block layout: (dim, dim_out, heads, window, q_stride)."""
    out = []
    total = 0
    for stage, nblocks in enumerate(cfg["blocks"]):
        for bi in range(nblocks):
            first = stage > 0 and bi == 0
            dim = cfg["embed_dims"][stage - 1] if first else cfg["embed_dims"][stage]
            window = cfg["window_sizes"][stage - 1] if first \
                else cfg["window_sizes"][stage]
            if total in cfg["global_blocks"]:
                window = 0
            out.append(dict(
                dim=dim, dim_out=cfg["embed_dims"][stage],
                heads=cfg["heads"][stage], window=window,
                q_stride=cfg["q_stride"]
                if first and stage <= cfg["q_pool_stages"] else None,
                stage_end=(bi == nblocks - 1)))
            total += 1
    return out


def hiera_forward(params: Params, cfg: dict, pixels: jnp.ndarray
                  ) -> List[jnp.ndarray]:
    """pixels [B, H, W, 3] -> per-stage feature maps [B, h, w, C_stage]."""
    x = _conv(params["patch_embed"], pixels, stride=cfg["patch_stride"],
              pad=cfg["patch_pad"])
    b, h, w, c = x.shape

    # background pos embed bicubic-resized to (h, w) + tiled window embed
    from versecrafter_tpu.perception.dinov2 import _bicubic_weights
    pe = params["pos_embed"].astype(jnp.float32)  # [1, C, bh, bw]
    wh = jnp.asarray(_bicubic_weights(h, pe.shape[2]))
    wwm = jnp.asarray(_bicubic_weights(w, pe.shape[3]))
    pe = jnp.einsum("oh,bchw->bcow", wh, pe)
    pe = jnp.einsum("ow,bchw->bcho", wwm, pe)
    win = params["pos_embed_window"].astype(jnp.float32)  # [1, C, ws, ws]
    reps = (1, 1, h // win.shape[2], w // win.shape[3])
    pe = pe + jnp.tile(win, reps)
    x = x + pe.transpose(0, 2, 3, 1).astype(x.dtype)

    layout = _block_layout(cfg)
    stages: List[jnp.ndarray] = []
    for bp, lo in zip(params["blocks"], layout):
        residual = x
        hcur, wcur = x.shape[1], x.shape[2]
        xn = _ln(x, bp["norm1"])
        if lo["dim"] != lo["dim_out"]:
            residual = _lin(bp["proj"], xn)
            if lo["q_stride"]:
                residual = _max_pool2x2(residual, lo["q_stride"])

        ws = lo["window"]
        if ws > 0:
            xw, pad_hw = _window_partition(xn, ws)
        else:
            xw = xn
        bw, hw_, ww_, _ = xw.shape
        qkv = _lin(bp["qkv"], xw.reshape(bw, hw_ * ww_, -1))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if lo["q_stride"]:
            q = _max_pool2x2(q.reshape(bw, hw_, ww_, -1), lo["q_stride"])
            hw_, ww_ = q.shape[1], q.shape[2]
            q = q.reshape(bw, hw_ * ww_, -1)
        o = _attention(q, k, v, lo["heads"])
        o = _lin(bp["attn_proj"], o).reshape(bw, hw_, ww_, -1)
        if lo["q_stride"]:
            hcur, wcur = residual.shape[1], residual.shape[2]
            if ws > 0:
                ws = ws // lo["q_stride"]
                pad_hw = (hcur + (-hcur) % ws, wcur + (-wcur) % ws)
        if lo["window"] > 0:
            o = _window_unpartition(o, ws, pad_hw, (hcur, wcur))
        x = residual + o
        x = x + _mlp(bp["mlp"], _ln(x, bp["norm2"]),
                     lambda t: jax.nn.gelu(t, approximate=False))
        if lo["stage_end"]:
            stages.append(x)
    return stages


def neck_forward(params: Params, cfg: dict, stages: Sequence[jnp.ndarray]
                 ) -> List[jnp.ndarray]:
    """FPN: per-level 1x1 conv + nearest top-down at fpn_top_down levels.
    Returns the finest `num_levels` maps ordered high-res -> low-res."""
    n = len(stages) - 1
    outs = []
    prev = None
    for i in range(n, -1, -1):
        lateral = _conv(params["convs"][n - i], stages[i])
        if i in cfg["fpn_top_down"] and i != n:
            up = jnp.repeat(jnp.repeat(prev.astype(jnp.float32), 2, axis=1),
                            2, axis=2).astype(lateral.dtype)
            prev = lateral + up
        else:
            prev = lateral
        outs.append(prev)
    return outs[-cfg["num_levels"]:][::-1]


def image_embeddings(params: Params, cfg: dict, pixels: jnp.ndarray
                     ) -> List[jnp.ndarray]:
    """Full vision path: Hiera -> FPN -> decoder conv_s0/s1 pre-projection
    -> no-memory embedding on the coarsest level. Returns [hi, mid, lo]
    NHWC maps (lo is the decoder's main 256-d image embedding)."""
    feats = neck_forward(params["neck"], cfg,
                         hiera_forward(params["hiera"], cfg, pixels))
    feats[0] = _conv(params["decoder"]["conv_s0"], feats[0])
    feats[1] = _conv(params["decoder"]["conv_s1"], feats[1])
    feats[-1] = feats[-1] + params["no_memory_embedding"][0].astype(feats[-1].dtype)
    return feats


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def _fourier_pe(table: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    c = (2.0 * coords01 - 1.0).astype(jnp.float32) @ table.astype(jnp.float32)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)


def encode_prompts(params: Params, cfg: dict,
                   boxes: Optional[jnp.ndarray] = None,
                   points: Optional[jnp.ndarray] = None,
                   labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """boxes [B, Q, 4] (xyxy, input-image pixels) and/or points
    [B, Q, P, 2] + labels [B, Q, P] -> sparse embeddings [B, Q, T, C]."""
    pe = params["prompt"]
    table = params["shared_pe"]
    size = cfg["image_size"]
    sparse = None
    if points is not None:
        pts = (points + 0.5) / size
        if boxes is None:
            pts = jnp.pad(pts, ((0, 0), (0, 0), (0, 1), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, 0), (0, 1)),
                             constant_values=-1)
        emb = _fourier_pe(table, pts)
        emb = jnp.where(labels[..., None] == -1,
                        pe["not_a_point"].astype(emb.dtype), emb)
        emb = jnp.where(labels[..., None] == -10, 0.0, emb)
        emb = emb + (pe["point_embed"][jnp.clip(labels, 0, None)]
                     * (labels >= 0)[..., None]).astype(emb.dtype)
        sparse = emb
    if boxes is not None:
        corners = (boxes.reshape(*boxes.shape[:2], 2, 2) + 0.5) / size
        corners = jnp.pad(corners, ((0, 0), (0, 0), (0, 1), (0, 0)))
        emb = _fourier_pe(table, corners)
        emb = emb.at[:, :, 0].add(pe["point_embed"][2].astype(emb.dtype))
        emb = emb.at[:, :, 1].add(pe["point_embed"][3].astype(emb.dtype))
        emb = emb.at[:, :, 2].set(pe["not_a_point"].astype(emb.dtype))
        sparse = emb if sparse is None else jnp.concatenate([sparse, emb], 2)
    return sparse


def image_wide_pe(params: Params, cfg: dict) -> jnp.ndarray:
    """The decoder's image positional embedding [gh, gw, C] (fourier over
    the pixel-center grid of the coarsest embedding)."""
    g = cfg["image_size"] // cfg["prompt_patch"]
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys), -1)  # [g, g, 2] (x, y)
    return _fourier_pe(params["shared_pe"], grid)


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------

def _dec_attn(p, q, k, v, heads):
    qp, kp, vp = _lin(p["q_proj"], q), _lin(p["k_proj"], k), _lin(p["v_proj"], v)
    return _lin(p["o_proj"], _attention(qp, kp, vp, heads))


def decode_masks(params: Params, cfg: dict,
                 embeds: Sequence[jnp.ndarray],
                 sparse: jnp.ndarray,
                 multimask_output: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """embeds from image_embeddings(); sparse [B, Q, T, C].
    Returns (masks [B, Q, M, 4h, 4w], iou [B, Q, M], obj_logits [B, Q, 1])."""
    dp = params["decoder"]
    feat_s0, feat_s1, image_embed = embeds
    b, gh, gw, c = image_embed.shape
    q_batch = sparse.shape[1]
    nm = cfg["num_mask_tokens"]
    heads = cfg["dec_heads"]

    out_tokens = jnp.concatenate(
        [dp["obj_score_token"], dp["iou_token"], dp["mask_tokens"]], 0)
    tokens = jnp.broadcast_to(out_tokens[None],
                              (b * q_batch, *out_tokens.shape))
    tokens = jnp.concatenate(
        [tokens, sparse.reshape(b * q_batch, *sparse.shape[2:])], 1
    ).astype(image_embed.dtype)

    # dense prompt: no-mask embedding
    img = image_embed + params["prompt"]["no_mask"].astype(image_embed.dtype)
    keys = jnp.repeat(img.reshape(b, gh * gw, c), q_batch, axis=0)
    key_pe = jnp.broadcast_to(
        image_wide_pe(params, cfg).reshape(1, gh * gw, c),
        (b * q_batch, gh * gw, c)).astype(keys.dtype)

    queries = tokens
    for i, layer in enumerate(dp["layers"]):
        if i == 0:  # skip_first_layer_pe: output REPLACES queries
            queries = _dec_attn(layer["self_attn"], queries, queries,
                                queries, heads)
        else:
            qq = queries + tokens
            queries = queries + _dec_attn(layer["self_attn"], qq, qq,
                                          queries, heads)
        queries = _ln(queries, layer["norm1"])
        qq = queries + tokens
        kk = keys + key_pe
        queries = queries + _dec_attn(layer["cross_t2i"], qq, kk, keys, heads)
        queries = _ln(queries, layer["norm2"])
        queries = queries + _mlp(layer["mlp"], queries, jax.nn.relu)
        queries = _ln(queries, layer["norm3"])
        qq = queries + tokens
        kk = keys + key_pe
        keys = keys + _dec_attn(layer["cross_i2t"], kk, qq, queries, heads)
        keys = _ln(keys, layer["norm4"])
    qq = queries + tokens
    kk = keys + key_pe
    queries = queries + _dec_attn(dp["final_attn"], qq, kk, keys, heads)
    queries = _ln(queries, dp["norm_final"])

    iou_tok = queries[:, 1]
    mask_toks = queries[:, 2:2 + nm]

    img_sp = keys.reshape(b * q_batch, gh, gw, c)
    s0 = jnp.repeat(feat_s0, q_batch, axis=0)
    s1 = jnp.repeat(feat_s1, q_batch, axis=0)
    up = _conv_transpose2x2(dp["upscale_conv1"], img_sp) + s1
    up = jax.nn.gelu(_ln(up, dp["upscale_norm"]), approximate=False)
    up = jax.nn.gelu(_conv_transpose2x2(dp["upscale_conv2"], up) + s0,
                     approximate=False)

    hyper = jnp.stack(
        [_mlp(dp["hyper_mlps"][i], mask_toks[:, i], jax.nn.relu)
         for i in range(nm)], 1)  # [BQ, nm, c/8]
    hh, ww2 = up.shape[1], up.shape[2]
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
    masks = masks.reshape(b, q_batch, nm, hh, ww2)

    iou = jax.nn.sigmoid(_mlp(dp["iou_head"], iou_tok, jax.nn.relu))
    iou = iou.reshape(b, q_batch, nm)
    obj = _mlp(dp["obj_head"], queries[:, 0], jax.nn.relu).reshape(b, q_batch, 1)

    if multimask_output:
        return masks[:, :, 1:], iou[:, :, 1:], obj
    # dynamic single-mask via stability (inference semantics)
    delta = cfg["stability_delta"]
    flat = masks.reshape(*masks.shape[:3], -1)
    area_i = (flat > delta).sum(-1).astype(jnp.float32)
    area_u = (flat > -delta).sum(-1).astype(jnp.float32)
    stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1), 1.0)
    is_stable = stability[:, :, 0:1] >= cfg["stability_thresh"]
    best = jnp.argmax(iou[:, :, 1:], axis=-1)  # [B, Q]
    best_masks = jnp.take_along_axis(
        masks[:, :, 1:], best[:, :, None, None, None], axis=2)
    best_iou = jnp.take_along_axis(iou[:, :, 1:], best[:, :, None], axis=2)
    m = jnp.where(is_stable[..., None, None], masks[:, :, 0:1], best_masks)
    s = jnp.where(is_stable, iou[:, :, 0:1], best_iou)
    return m, s, obj


def predict_boxes(params: Params, cfg: dict, pixels: jnp.ndarray,
                  boxes: jnp.ndarray, multimask_output: bool = True):
    """One-call box-prompted prediction: pixels [B, H, W, 3] (normalized),
    boxes [B, Q, 4] xyxy in input-image pixels."""
    embeds = image_embeddings(params, cfg, pixels)
    sparse = encode_prompts(params, cfg, boxes=boxes)
    return decode_masks(params, cfg, embeds, sparse, multimask_output)


_SAM2_JIT: dict = {}


def predict_boxes_jit(params: Params, cfg: dict, pixels, boxes,
                      multimask_output: bool = True):
    """Cached jitted predict_boxes — eager per-op execution pays one remote
    dispatch per op on the axon backend (Hiera-L 1024² measured 1.35 s/img
    eager); one compiled program per (cfg, multimask) key."""
    key = (tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in cfg.items())), bool(multimask_output))
    if key not in _SAM2_JIT:
        _SAM2_JIT[key] = jax.jit(
            lambda p, px, bx, _cfg=dict(cfg), _m=bool(multimask_output):
            predict_boxes(p, _cfg, px, bx, _m))
    return _SAM2_JIT[key](params, pixels, boxes)


# ---------------------------------------------------------------------------
# conversion / init
# ---------------------------------------------------------------------------

def cfg_from_hf(config) -> dict:
    """Build our static cfg dict from a transformers Sam2Config."""
    bb = config.vision_config.backbone_config
    return dict(
        embed_dims=tuple(bb.embed_dim_per_stage),
        heads=tuple(bb.num_attention_heads_per_stage),
        blocks=tuple(bb.blocks_per_stage),
        window_sizes=tuple(bb.window_size_per_stage),
        global_blocks=tuple(bb.global_attention_blocks),
        q_stride=bb.query_stride[0], q_pool_stages=bb.num_query_pool_stages,
        window_pe_bg=tuple(bb.window_positional_embedding_background_size),
        patch_kernel=bb.patch_kernel_size[0], patch_stride=bb.patch_stride[0],
        patch_pad=bb.patch_padding[0],
        fpn_hidden=config.vision_config.fpn_hidden_size,
        num_levels=config.vision_config.num_feature_levels,
        fpn_top_down=tuple(config.vision_config.fpn_top_down_levels),
        image_size=config.prompt_encoder_config.image_size,
        prompt_patch=config.prompt_encoder_config.patch_size,
        dec_heads=config.mask_decoder_config.num_attention_heads,
        dec_layers=config.mask_decoder_config.num_hidden_layers,
        dec_mlp=config.mask_decoder_config.mlp_dim,
        dec_downsample=config.mask_decoder_config.attention_downsample_rate,
        num_mask_tokens=config.mask_decoder_config.num_multimask_outputs + 1,
        stability_delta=config.mask_decoder_config.dynamic_multimask_stability_delta,
        stability_thresh=config.mask_decoder_config.dynamic_multimask_stability_thresh,
    )


def convert_hf_sam2(state_dict, cfg: dict, dtype=jnp.float32) -> Params:
    """Convert a HuggingFace Sam2Model state_dict."""
    def g(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t)

    def lin(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight").T, dtype),
                "bias": jnp.asarray(g(f"{prefix}.bias"), dtype)}

    def conv(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight"), dtype),
                "bias": jnp.asarray(g(f"{prefix}.bias"), dtype)}

    def lnp(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight"), jnp.float32),
                "bias": jnp.asarray(g(f"{prefix}.bias"), jnp.float32)}

    def mlp(prefix):
        p = {"proj_in": lin(f"{prefix}.proj_in"),
             "proj_out": lin(f"{prefix}.proj_out"), "layers": []}
        i = 0
        while f"{prefix}.layers.{i}.weight" in state_dict:
            p["layers"].append(lin(f"{prefix}.layers.{i}"))
            i += 1
        return p

    bbp = "vision_encoder.backbone"
    blocks = []
    i = 0
    while f"{bbp}.blocks.{i}.layer_norm1.weight" in state_dict:
        pre = f"{bbp}.blocks.{i}"
        bp = {"norm1": lnp(f"{pre}.layer_norm1"),
              "qkv": lin(f"{pre}.attn.qkv"),
              "attn_proj": lin(f"{pre}.attn.proj"),
              "norm2": lnp(f"{pre}.layer_norm2"),
              "mlp": mlp(f"{pre}.mlp")}
        if f"{pre}.proj.weight" in state_dict:
            bp["proj"] = lin(f"{pre}.proj")
        blocks.append(bp)
        i += 1

    neck_convs = []
    i = 0
    while f"vision_encoder.neck.convs.{i}.weight" in state_dict:
        neck_convs.append(conv(f"vision_encoder.neck.convs.{i}"))
        i += 1

    def dec_attn(prefix):
        return {k: lin(f"{prefix}.{k}")
                for k in ("q_proj", "k_proj", "v_proj", "o_proj")}

    layers = []
    i = 0
    while f"mask_decoder.transformer.layers.{i}.layer_norm1.weight" in state_dict:
        pre = f"mask_decoder.transformer.layers.{i}"
        layers.append({
            "self_attn": dec_attn(f"{pre}.self_attn"),
            "norm1": lnp(f"{pre}.layer_norm1"),
            "cross_t2i": dec_attn(f"{pre}.cross_attn_token_to_image"),
            "norm2": lnp(f"{pre}.layer_norm2"),
            "mlp": mlp(f"{pre}.mlp"),
            "norm3": lnp(f"{pre}.layer_norm3"),
            "cross_i2t": dec_attn(f"{pre}.cross_attn_image_to_token"),
            "norm4": lnp(f"{pre}.layer_norm4"),
        })
        i += 1

    nm = cfg["num_mask_tokens"]
    return {
        "hiera": {
            "patch_embed": conv(f"{bbp}.patch_embed.projection"),
            "pos_embed": jnp.asarray(g(f"{bbp}.pos_embed"), jnp.float32),
            "pos_embed_window": jnp.asarray(g(f"{bbp}.pos_embed_window"),
                                            jnp.float32),
            "blocks": blocks,
        },
        "neck": {"convs": neck_convs},
        "shared_pe": jnp.asarray(
            g("shared_image_embedding.positional_embedding"), jnp.float32),
        "no_memory_embedding": jnp.asarray(g("no_memory_embedding"), dtype),
        "prompt": {
            "point_embed": jnp.asarray(g("prompt_encoder.point_embed.weight"), dtype),
            "not_a_point": jnp.asarray(
                g("prompt_encoder.not_a_point_embed.weight"), dtype)[0],
            "no_mask": jnp.asarray(
                g("prompt_encoder.no_mask_embed.weight"), dtype)[0],
        },
        "decoder": {
            "obj_score_token": jnp.asarray(g("mask_decoder.obj_score_token.weight"), dtype),
            "iou_token": jnp.asarray(g("mask_decoder.iou_token.weight"), dtype),
            "mask_tokens": jnp.asarray(g("mask_decoder.mask_tokens.weight"), dtype),
            "layers": layers,
            "final_attn": dec_attn("mask_decoder.transformer.final_attn_token_to_image"),
            "norm_final": lnp("mask_decoder.transformer.layer_norm_final_attn"),
            "upscale_conv1": {
                "weight": jnp.asarray(g("mask_decoder.upscale_conv1.weight"), dtype),
                "bias": jnp.asarray(g("mask_decoder.upscale_conv1.bias"), dtype)},
            "upscale_conv2": {
                "weight": jnp.asarray(g("mask_decoder.upscale_conv2.weight"), dtype),
                "bias": jnp.asarray(g("mask_decoder.upscale_conv2.bias"), dtype)},
            "upscale_norm": lnp("mask_decoder.upscale_layer_norm"),
            "hyper_mlps": [mlp(f"mask_decoder.output_hypernetworks_mlps.{i}")
                           for i in range(nm)],
            "iou_head": mlp("mask_decoder.iou_prediction_head"),
            "obj_head": mlp("mask_decoder.pred_obj_score_head"),
            "conv_s0": conv("mask_decoder.conv_s0"),
            "conv_s1": conv("mask_decoder.conv_s1"),
        },
    }


def init_sam2(key, cfg: dict = TEST_TINY, dtype=jnp.float32) -> Params:
    """Random init with the converted-checkpoint tree structure (offline
    bring-up; shapes match convert_hf_sam2 output)."""
    ks = iter(jax.random.split(key, 4096))
    nk = lambda: next(ks)

    def lin(cin, cout):
        return {"weight": (jax.random.normal(nk(), (cin, cout))
                           * (2.0 / (cin + cout)) ** 0.5).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def conv(cout, cin, k):
        return {"weight": (jax.random.normal(nk(), (cout, cin, k, k))
                           / math.sqrt(cin * k * k)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def ct(cin, cout):
        return {"weight": (jax.random.normal(nk(), (cin, cout, 2, 2))
                           / math.sqrt(cin * 4)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def lnp(c):
        return {"weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def mlp(cin, hid, cout, depth=2):
        return {"proj_in": lin(cin, hid), "proj_out": lin(hid, cout),
                "layers": [lin(hid, hid) for _ in range(depth - 2)]}

    blocks = []
    for lo in _block_layout(cfg):
        bp = {"norm1": lnp(lo["dim"]),
              "qkv": lin(lo["dim"], lo["dim_out"] * 3),
              "attn_proj": lin(lo["dim_out"], lo["dim_out"]),
              "norm2": lnp(lo["dim_out"]),
              "mlp": mlp(lo["dim_out"], int(lo["dim_out"] * 4), lo["dim_out"])}
        if lo["dim"] != lo["dim_out"]:
            bp["proj"] = lin(lo["dim"], lo["dim_out"])
        blocks.append(bp)

    c = cfg["fpn_hidden"]
    d0 = cfg["embed_dims"][0]

    def dec_attn(rate):
        inner = c // rate
        return {"q_proj": lin(c, inner), "k_proj": lin(c, inner),
                "v_proj": lin(c, inner), "o_proj": lin(inner, c)}

    nm = cfg["num_mask_tokens"]
    return {
        "hiera": {
            "patch_embed": conv(d0, 3, cfg["patch_kernel"]),
            "pos_embed": (jax.random.normal(
                nk(), (1, d0, *cfg["window_pe_bg"])) * 0.02).astype(jnp.float32),
            "pos_embed_window": (jax.random.normal(
                nk(), (1, d0, cfg["window_sizes"][0], cfg["window_sizes"][0]))
                * 0.02).astype(jnp.float32),
            "blocks": blocks,
        },
        "neck": {"convs": [conv(c, ch, 1)
                           for ch in cfg["embed_dims"][::-1]]},
        "shared_pe": jax.random.normal(nk(), (2, c // 2)).astype(jnp.float32),
        "no_memory_embedding": jnp.zeros((1, 1, c), dtype),
        "prompt": {
            "point_embed": (jax.random.normal(nk(), (4, c)) * 0.02).astype(dtype),
            "not_a_point": (jax.random.normal(nk(), (c,)) * 0.02).astype(dtype),
            "no_mask": (jax.random.normal(nk(), (c,)) * 0.02).astype(dtype),
        },
        "decoder": {
            "obj_score_token": (jax.random.normal(nk(), (1, c)) * 0.02).astype(dtype),
            "iou_token": (jax.random.normal(nk(), (1, c)) * 0.02).astype(dtype),
            "mask_tokens": (jax.random.normal(nk(), (nm, c)) * 0.02).astype(dtype),
            "layers": [{
                "self_attn": dec_attn(1), "norm1": lnp(c),
                "cross_t2i": dec_attn(cfg["dec_downsample"]), "norm2": lnp(c),
                "mlp": mlp(c, cfg["dec_mlp"], c), "norm3": lnp(c),
                "cross_i2t": dec_attn(cfg["dec_downsample"]), "norm4": lnp(c),
            } for _ in range(cfg["dec_layers"])],
            "final_attn": dec_attn(cfg["dec_downsample"]),
            "norm_final": lnp(c),
            "upscale_conv1": ct(c, c // 4),
            "upscale_conv2": ct(c // 4, c // 8),
            "upscale_norm": lnp(c // 4),
            "hyper_mlps": [mlp(c, c, c // 8, 3) for _ in range(nm)],
            "iou_head": mlp(c, c, nm, 3),
            "obj_head": mlp(c, c, 1, 3),
            "conv_s0": conv(c // 8, c, 1),
            "conv_s1": conv(c // 4, c, 1),
        },
    }
