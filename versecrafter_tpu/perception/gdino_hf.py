"""GroundingDino (open-vocabulary detection), JAX — parity-faithful to the
public GroundingDino architecture so real checkpoints convert 1:1
(validated against the HuggingFace GroundingDinoForObjectDetection with
converted weights; see tests/test_gdino_parity.py).

This validates the text-prompted detection capability the reference consumes
from the Grounded-SAM-2 submodule (/root/reference/inference/
grounded_sam2_infer.py:143-150). It is the detection half of the
segmenter's neural backend (masks come from perception/sam2.py).

Pieces (exact module math of the public design):
- Swin backbone (relative-position-bias windowed attention, shifted windows
  with the 9-region attention mask, patch merging), per-stage output norms;
- BERT text backbone driven by the special-token block-diagonal
  self-attention mask and intra-phrase position ids;
- encoder layers = BiMultiHead vision<->text fusion (layer-scale residuals)
  + text self-enhancer (sine position ids) + multiscale deformable attention
  (bilinear grid sampling, align_corners=False semantics);
- two-stage query selection: per-token proposals (grid + 0.05*2^level),
  contrastive text scores, top-k; learned target embeddings;
- decoder layers = self-attn + text cross-attn + deformable cross-attn with
  sine reference-point query positions and per-layer box refinement;
- contrastive class head (query . text, padded to max_text_len).

Scope: the full-valid pixel-mask path (no image padding) — the natural TPU
deployment (fixed shapes); masked-batch support is host-side padding.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

SPECIAL_TOKENS = (101, 102, 1012, 1029)  # [CLS] [SEP] . ?

# The production GroundingDINO Swin-T + BERT-base shape (the public
# grounding-dino-tiny the reference's Grounded-SAM-2 submodule loads,
# grounded_sam2_infer.py:104-143): 900 queries, 4-level deformable
# encoder/decoder, d_model 256.
SWINT_CFG = dict(d_model=256, enc_heads=8, dec_heads=8, fusion_heads=4,
                 enc_points=4, dec_points=4, num_queries=900,
                 max_text_len=256, pos_temperature=20.0, swin_patch=4,
                 swin_window=7, swin_heads=(3, 6, 12, 24),
                 swin_out_stages=(1, 2, 3), bert_heads=12)


def hf_swint_config():
    """The matching transformers.GroundingDinoConfig — used to fresh-init
    real-scale weights through the HF model (smoke/bench; no checkpoints
    ship in this environment) so the converter path is always exercised."""
    import transformers
    swin = transformers.SwinConfig(
        image_size=224, patch_size=4, embed_dim=96, depths=[2, 2, 6, 2],
        num_heads=[3, 6, 12, 24], window_size=7, out_indices=[2, 3, 4])
    return transformers.GroundingDinoConfig(
        backbone_config=swin, text_config=transformers.BertConfig(),
        d_model=256, encoder_layers=6, decoder_layers=6,
        encoder_attention_heads=8, decoder_attention_heads=8,
        encoder_ffn_dim=2048, decoder_ffn_dim=2048, num_queries=900,
        max_text_len=256, positional_embedding_temperature=20)


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _lin(p, x):
    y = jnp.dot(x, p["weight"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _mha(p, q, k, v, heads, mask=None):
    """GroundingDinoMultiheadAttention: query/key/value/out_proj; additive
    float mask broadcastable to [B, heads, Q, K]."""
    b, nq, d = q.shape
    hd = d // heads
    qh = _lin(p["query"], q).reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = _lin(p["key"], k).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = _lin(p["value"], v).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bnqd,bnkd->bnqk", qh, kh) / math.sqrt(hd)
    if mask is not None:
        s = s + mask.astype(s.dtype)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, vh).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return _lin(p["out_proj"], o)


# ---------------------------------------------------------------------------
# Swin backbone
# ---------------------------------------------------------------------------

def _swin_attn(p, x, heads, window, mask=None):
    """x: [nW*B, win*win, C]; relative position bias from the table; optional
    per-window additive mask [nW, win^2, win^2]."""
    bW, n, c = x.shape
    hd = c // heads
    q = _lin(p["query"], x).reshape(bW, n, heads, hd).transpose(0, 2, 1, 3)
    k = _lin(p["key"], x).reshape(bW, n, heads, hd).transpose(0, 2, 1, 3)
    v = _lin(p["value"], x).reshape(bW, n, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bnqd,bnkd->bnqk", q, k) / math.sqrt(hd)

    # relative position bias
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    idx = rel.sum(-1)
    bias = p["relative_position_bias_table"][jnp.asarray(idx.reshape(-1))]
    bias = bias.reshape(n, n, -1).transpose(2, 0, 1)
    s = s + bias[None].astype(s.dtype)

    if mask is not None:
        nW = mask.shape[0]
        s = s.reshape(bW // nW, nW, heads, n, n) + \
            mask[None, :, None].astype(s.dtype)
        s = s.reshape(bW, heads, n, n)
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", a, v).transpose(0, 2, 1, 3).reshape(bW, n, c)
    return _lin(p["out_dense"], o)


def _swin_shift_mask(h, w, window, shift):
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(mask != 0, -100.0, 0.0), jnp.float32)


def swin_forward(params: Params, cfg: dict, pixels: jnp.ndarray
                 ) -> List[jnp.ndarray]:
    """pixels [B, 3, H, W] -> per-out-stage NCHW features (normed)."""
    b = pixels.shape[0]
    ps = cfg["swin_patch"]
    x = pixels.transpose(0, 2, 3, 1)
    H, W = x.shape[1:3]
    x = x.reshape(b, H // ps, ps, W // ps, ps, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, (H // ps) * (W // ps), 3 * ps * ps)
    x = _lin(params["patch_embed"], x)
    x = _ln(x, params["patch_norm"])
    h, w = H // ps, W // ps

    window = cfg["swin_window"]
    outs = []
    for si, stage in enumerate(params["stages"]):
        heads = cfg["swin_heads"][si]
        for bi, blk in enumerate(stage["blocks"]):
            shift = window // 2 if bi % 2 else 0
            if min(h, w) <= window:
                shift = 0
            win = min(window, h, w)
            shortcut = x
            hs = _ln(x, blk["layernorm_before"]).reshape(b, h, w, -1)
            pad_r = (win - w % win) % win
            pad_b = (win - h % win) % win
            hs = jnp.pad(hs, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = h + pad_b, w + pad_r
            if shift > 0:
                hs = jnp.roll(hs, (-shift, -shift), (1, 2))
            hw = hs.reshape(b, hp // win, win, wp // win, win, -1)
            hw = hw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, hs.shape[-1])
            amask = _swin_shift_mask(hp, wp, win, shift) if shift > 0 else None
            hw = _swin_attn(blk["attn"], hw, heads, win, amask)
            hw = hw.reshape(b, hp // win, wp // win, win, win, -1)
            hs = hw.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
            if shift > 0:
                hs = jnp.roll(hs, (shift, shift), (1, 2))
            hs = hs[:, :h, :w].reshape(b, h * w, -1)
            x = shortcut + hs
            hs = _ln(x, blk["layernorm_after"])
            hs = _lin(blk["output_dense"],
                      jax.nn.gelu(_lin(blk["intermediate_dense"], hs),
                                  approximate=False))
            x = x + hs
        if si in cfg["swin_out_stages"]:
            xo = _ln(x, params["out_norms"][cfg["swin_out_stages"].index(si)])
            outs.append(xo.reshape(b, h, w, -1).transpose(0, 3, 1, 2))
        if "downsample" in stage:
            xv = x.reshape(b, h, w, -1)
            f0 = xv[:, 0::2, 0::2]
            f1 = xv[:, 1::2, 0::2]
            f2 = xv[:, 0::2, 1::2]
            f3 = xv[:, 1::2, 1::2]
            xv = jnp.concatenate([f0, f1, f2, f3], -1)
            h, w = h // 2, w // 2
            xv = xv.reshape(b, h * w, -1)
            xv = _ln(xv, stage["downsample"]["norm"])
            x = _lin(stage["downsample"]["reduction"], xv)
    return outs


# ---------------------------------------------------------------------------
# BERT text backbone
# ---------------------------------------------------------------------------

def text_masks_and_positions(input_ids: np.ndarray):
    """generate_masks_with_special_tokens_and_transfer_map (host-side)."""
    bsz, n = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKENS)
    attn = np.tile(np.eye(n, dtype=bool)[None], (bsz, 1, 1))
    pos = np.zeros((bsz, n), np.int64)
    for row in range(bsz):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                attn[row, col, col] = True
                pos[row, col] = 0
            else:
                attn[row, prev + 1:col + 1, prev + 1:col + 1] = True
                pos[row, prev + 1:col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos


def bert_forward(params: Params, cfg: dict, input_ids, attn3d, position_ids):
    emb = params["embeddings"]
    x = emb["word"][input_ids] + emb["position"][position_ids] \
        + emb["token_type"][jnp.zeros_like(input_ids)]
    x = _ln(x, emb["LayerNorm"], eps=1e-12)
    mask = (1.0 - attn3d.astype(jnp.float32))[:, None] * jnp.finfo(jnp.float32).min
    heads = cfg["bert_heads"]
    for ly in params["layers"]:
        a = _mha({"query": ly["q"], "key": ly["k"], "value": ly["v"],
                  "out_proj": ly["attn_out"]}, x, x, x, heads, mask=mask)
        x = _ln(x + a, ly["attn_ln"], eps=1e-12)
        h = jax.nn.gelu(_lin(ly["inter"], x), approximate=False)
        x = _ln(x + _lin(ly["out"], h), ly["out_ln"], eps=1e-12)
    return x


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------

def sine_pos_2d(h: int, w: int, d_model: int, temperature: float = 20.0):
    """GroundingDinoSinePositionEmbedding with a full-valid mask: [d, h, w]."""
    half = d_model // 2
    eps = 1e-6
    y = (np.arange(h, dtype=np.float64) + 1) / (h + eps) * 2 * np.pi
    x = (np.arange(w, dtype=np.float64) + 1) / (w + eps) * 2 * np.pi
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    py = y[:, None] / dim_t  # [h, half]
    px = x[:, None] / dim_t
    def inter(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(*p.shape[:-1], -1)
    py = inter(py)[:, None, :].repeat(w, 1)
    px = inter(px)[None, :, :].repeat(h, 0)
    pos = np.concatenate([py, px], -1).transpose(2, 0, 1)
    return jnp.asarray(pos, jnp.float32)


def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int = 128,
                       temperature: float = 10000.0, exchange_xy: bool = True):
    """[..., n] -> [..., n*num_pos_feats] (HF get_sine_pos_embed)."""
    scale = 2 * math.pi
    dim_t = temperature ** (2 * (jnp.arange(num_pos_feats) // 2) / num_pos_feats)
    parts = []
    for i in range(pos.shape[-1]):
        s = pos[..., i:i + 1] * scale / dim_t
        s = jnp.stack([jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])], -1)
        parts.append(s.reshape(*pos.shape[:-1], -1))
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, -1)


# ---------------------------------------------------------------------------
# deformable attention (exact grid_sample align_corners=False semantics)
# ---------------------------------------------------------------------------

def deformable_attention(p: Params, query, reference_points, value, shapes,
                         heads: int, n_points: int):
    """query [B,Q,D]; reference_points [B,Q,L,2or4] normalized; value
    [B,sum(HW),D] over `shapes` levels."""
    B, Q, D = query.shape
    L = len(shapes)
    hd = D // heads
    off = _lin(p["sampling_offsets"], query).reshape(B, Q, heads, L, n_points, 2)
    w = _lin(p["attention_weights"], query).reshape(B, Q, heads, L * n_points)
    w = jax.nn.softmax(w.astype(jnp.float32), -1).astype(query.dtype)
    w = w.reshape(B, Q, heads, L, n_points)
    v = _lin(p["value_proj"], value)

    nc = reference_points.shape[-1]
    if nc == 2:
        normalizer = jnp.asarray([[wd, ht] for ht, wd in shapes], jnp.float32)
        loc = reference_points[:, :, None, :, None, :] \
            + off / normalizer[None, None, None, :, None, :]
    else:
        loc = reference_points[:, :, None, :, None, :2] \
            + off / n_points * reference_points[:, :, None, :, None, 2:] * 0.5

    out = jnp.zeros((B, Q, heads, hd), jnp.float32)
    start = 0
    for li, (ht, wd) in enumerate(shapes):
        lvl = v[:, start:start + ht * wd].reshape(B, ht, wd, heads, hd)
        start += ht * wd
        g = 2 * loc[:, :, :, li] - 1                       # [B,Q,heads,P,2]
        # grid_sample align_corners=False: pix = ((g+1)*size - 1)/2
        gx = ((g[..., 0] + 1) * wd - 1) / 2
        gy = ((g[..., 1] + 1) * ht - 1) / 2
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = (gx - x0)[..., None]
        fy = (gy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # ONE gather per sample point instead of four. The bilinear corners
        # (y0,x0)..(y0+1,x0+1) are fetched as a single pre-built 2x2 PATCH
        # row: pad the level map with a zero ring (out-of-range corners then
        # read zero exactly like the per-corner ok-mask they replace), stack
        # the four shifted views along a new axis, and gather [4*hd]-wide
        # rows at the patch base (y0+1, x0+1). On TPU the gathers ARE the
        # deformable-attention cost and it is per-ROW overhead-bound (hd=32
        # rows are far below the transaction width), so 4x fewer rows at 4x
        # the width is the right trade (VERDICT r4 #5). The head stays
        # folded into the gather index — [.., heads, 4*hd] rows fetch
        # exactly the per-head slice.
        lvlp = jnp.pad(lvl, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        patch = jnp.stack(
            [lvlp[:, :-1, :-1], lvlp[:, :-1, 1:],
             lvlp[:, 1:, :-1], lvlp[:, 1:, 1:]], axis=-2)
        # [B, (ht+1)*(wd+1)*heads, 4*hd]
        flat = patch.reshape(B, (ht + 1) * (wd + 1) * heads, 4 * hd)
        hidx = jnp.arange(heads, dtype=jnp.int32)[None, None, :, None]
        # whole-point validity: inside [-1, size-1] at least one corner is
        # real and the zero ring covers the rest; outside, the clamped base
        # would read live rows — mask the sample entirely
        ok = ((x0i >= -1) & (x0i <= wd - 1)
              & (y0i >= -1) & (y0i <= ht - 1))
        idx = (jnp.clip(y0i + 1, 0, ht) * (wd + 1)
               + jnp.clip(x0i + 1, 0, wd)) * heads + hidx  # [B,Q,heads,P]
        g_ = jax.vmap(lambda fm, ii: fm[ii])(flat, idx.reshape(B, -1))
        samp4 = g_.reshape(B, Q, heads, n_points, 4, hd)
        samp4 = jnp.where(ok[..., None, None], samp4, 0.0)
        cw = jnp.stack(
            [(1 - fx) * (1 - fy), fx * (1 - fy),
             (1 - fx) * fy, fx * fy], axis=-2)             # [B,Q,h,P,4,1]
        samp = (samp4.astype(jnp.float32) * cw.astype(jnp.float32)).sum(-2)
        out = out + jnp.einsum("bqhpd,bqhp->bqhd",
                               samp, w[:, :, :, li].astype(jnp.float32))
    return _lin(p["output_proj"], out.reshape(B, Q, D).astype(query.dtype))


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def _mlp_head(p, x, act=jax.nn.relu):
    n = len(p["layers"])
    for i, lyr in enumerate(p["layers"]):
        x = _lin(lyr, x)
        if i < n - 1:
            x = act(x)
    return x


def _fusion(p, vis, txt, heads):
    vn = _ln(vis, p["layer_norm_vision"])
    tn = _ln(txt, p["layer_norm_text"])
    a = p["attn"]
    b, nv, _ = vn.shape
    nt = tn.shape[1]
    emb = a["vision_proj"]["weight"].shape[1]
    hd = emb // heads

    def resh(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    vq = resh(_lin(a["vision_proj"], vn) * (hd ** -0.5))
    tk = resh(_lin(a["text_proj"], tn))
    vv = resh(_lin(a["values_vision_proj"], vn))
    tv = resh(_lin(a["values_text_proj"], tn))

    s = jnp.einsum("bhvd,bhtd->bhvt", vq, tk)
    s = s - s.max()
    s = jnp.clip(s, -50000, 50000)
    st = s.transpose(0, 1, 3, 2)
    st = st - st.max(-1, keepdims=True)
    st = jnp.clip(st, -50000, 50000)

    va = jax.nn.softmax(s.astype(jnp.float32), -1).astype(vis.dtype)
    ta = jax.nn.softmax(st.astype(jnp.float32), -1).astype(vis.dtype)
    dv = jnp.einsum("bhvt,bhtd->bhvd", va, tv).transpose(0, 2, 1, 3).reshape(b, nv, emb)
    dt = jnp.einsum("bhtv,bhvd->bhtd", ta, vv).transpose(0, 2, 1, 3).reshape(b, nt, emb)
    dv = _lin(a["out_vision_proj"], dv)
    dt = _lin(a["out_text_proj"], dt)
    vis = vn + p["vision_param"].astype(vis.dtype) * dv
    txt = tn + p["text_param"].astype(txt.dtype) * dt
    return vis, txt


def encoder_forward(params: Params, cfg: dict, vis, vis_pos, shapes, txt,
                    text_self_masks, text_pos_ids):
    heads = cfg["enc_heads"]
    text_pos = get_sine_pos_embed(text_pos_ids[..., None].astype(jnp.float32),
                                  num_pos_feats=cfg["d_model"],
                                  exchange_xy=False)
    # reference points (full-valid): per-level normalized centers, tiled
    refs = []
    for (ht, wd) in shapes:
        yy, xx = np.mgrid[0:ht, 0:wd].astype(np.float64) + 0.5
        refs.append(np.stack([(xx / wd).reshape(-1), (yy / ht).reshape(-1)], -1))
    ref = jnp.asarray(np.concatenate(refs, 0), jnp.float32)
    ref = jnp.broadcast_to(ref[None, :, None, :],
                           (vis.shape[0], ref.shape[0], len(shapes), 2))

    tmask = (1.0 - text_self_masks.astype(jnp.float32))[:, None] \
        * jnp.finfo(jnp.float32).min
    for ly in params["layers"]:
        vis, txt = _fusion(ly["fusion_layer"], vis, txt, cfg["fusion_heads"])
        te = ly["text_enhancer_layer"]
        qk = txt + text_pos.astype(txt.dtype)
        a = _mha({"query": te["q"], "key": te["k"], "value": te["v"],
                  "out_proj": te["attn_out"]}, qk, qk, txt,
                 cfg["enc_heads"] // 2, mask=tmask)
        txt = _ln(txt + a, te["layer_norm_before"])
        res = txt
        txt = _lin(te["fc2"], jax.nn.relu(_lin(te["fc1"], txt)))
        txt = _ln(res + txt, te["layer_norm_after"])

        dl = ly["deformable_layer"]
        h = deformable_attention(dl["self_attn"], vis + vis_pos.astype(vis.dtype),
                                 ref, vis, shapes, heads, cfg["enc_points"])
        vis = _ln(vis + h, dl["self_attn_layer_norm"])
        res = vis
        vis = _lin(dl["fc2"], jax.nn.relu(_lin(dl["fc1"], vis)))
        vis = _ln(res + vis, dl["final_layer_norm"])
    return vis, txt


def decoder_forward(params: Params, cfg: dict, target, ref_boxes, vis, txt,
                    shapes, text_token_mask):
    heads = cfg["dec_heads"]
    tmask = jnp.where(text_token_mask[:, None, None, :], 0.0,
                      jnp.finfo(jnp.float32).min)
    for idx, ly in enumerate(params["layers"]):
        ref_in = ref_boxes[:, :, None, :]  # valid_ratios == 1
        ref_in = jnp.broadcast_to(ref_in, (*ref_boxes.shape[:2], len(shapes), 4))
        qpos = get_sine_pos_embed(ref_in[:, :, 0, :],
                                  num_pos_feats=cfg["d_model"] // 2)
        qpos = _mlp_head(params["reference_points_head"], qpos).astype(target.dtype)

        qk = target + qpos
        a = _mha(ly["self_attn"], qk, qk, target, heads)
        target = _ln(target + a, ly["self_attn_layer_norm"])
        a = _mha(ly["encoder_attn_text"], target + qpos, txt, txt, heads,
                 mask=tmask)
        target = _ln(target + a, ly["encoder_attn_text_layer_norm"])
        a = deformable_attention(ly["encoder_attn"], target + qpos, ref_in,
                                 vis, shapes, heads, cfg["dec_points"])
        target = _ln(target + a, ly["encoder_attn_layer_norm"])
        res = target
        target = _lin(ly["fc2"], jax.nn.relu(_lin(ly["fc1"], target)))
        target = _ln(res + target, ly["final_layer_norm"])

        delta = _mlp_head(params["bbox_embed"][idx], target)
        ref_boxes = jax.nn.sigmoid(
            delta + jax.scipy.special.logit(jnp.clip(ref_boxes, 1e-5, 1 - 1e-5)))
    return _ln(target, params["layer_norm"]), ref_boxes


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def gdino_forward(params: Params, cfg: dict, pixel_values: jnp.ndarray,
                  input_ids, attn3d=None, pos_ids=None):
    """pixel_values [B, 3, H, W] (ImageNet-normalized, H=W multiple of 32 *
    window*patch tiles); input_ids [B, L] BERT tokens.
    Returns (logits [B, Q, max_text_len], boxes [B, Q, 4] cxcywh).

    attn3d/pos_ids: precomputed text_masks_and_positions outputs — pass
    them to make this function jit-traceable (gdino_forward_jit does;
    they're the only value-dependent host computation)."""
    B = pixel_values.shape[0]
    d = cfg["d_model"]
    # activations follow the converted-weight dtype (convert_hf_gdino
    # dtype=bf16 halves the deformable-attention gather traffic and runs
    # the Swin/BERT/encoder matmuls at the 2x bf16 MXU rate; sampling
    # locations, softmaxes, layernorms and the box sigmoid/logit recursion
    # stay fp32 regardless)
    pixel_values = pixel_values.astype(
        params["swin"]["patch_embed"]["weight"].dtype)
    if attn3d is None or pos_ids is None:
        attn3d_np, pos_np = text_masks_and_positions(np.asarray(input_ids))
        attn3d = jnp.asarray(attn3d_np)
        pos_ids = jnp.asarray(pos_np)
    text_token_mask = jnp.ones(input_ids.shape, bool)

    txt = bert_forward(params["text_backbone"], cfg, jnp.asarray(input_ids),
                       attn3d, pos_ids)
    txt = _lin(params["text_projection"], txt)

    feats = swin_forward(params["swin"], cfg, pixel_values)
    # extra stride-64 level from the last stage feature
    srcs = []
    for i, f in enumerate(feats):
        x = _gn_conv(params["input_proj"][i], f)
        srcs.append(x)
    extra = _gn_conv(params["input_proj"][len(feats)], feats[-1], stride=2)
    srcs.append(extra)

    shapes = [(s.shape[2], s.shape[3]) for s in srcs]
    vis = jnp.concatenate(
        [s.reshape(B, d, -1).transpose(0, 2, 1) for s in srcs], 1)
    pos = jnp.concatenate([
        (sine_pos_2d(h, w, d, cfg["pos_temperature"]).reshape(d, -1).T
         + params["level_embed"][li][None])[None].repeat(B, 0)
        for li, (h, w) in enumerate(shapes)], 1)

    vis, txt_e = encoder_forward(params["encoder"], cfg, vis, pos, shapes, txt,
                                 attn3d, pos_ids)

    # two-stage query selection
    props = []
    for lvl, (h, w) in enumerate(shapes):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        grid = np.stack([(xx + 0.5) / w, (yy + 0.5) / h], -1).reshape(-1, 2)
        wh = np.full_like(grid, 0.05 * (2.0 ** lvl))
        props.append(np.concatenate([grid, wh], -1))
    props = np.concatenate(props, 0)
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    props_logit = np.where(valid[:, None],
                           np.log(props / (1 - props)), np.inf)
    props_logit = jnp.asarray(props_logit, jnp.float32)[None]
    obj = jnp.where(jnp.asarray(valid)[None, :, None], vis, 0.0)
    obj = _ln(_lin(params["enc_output"], obj), params["enc_output_norm"])

    cls = jnp.einsum("bnd,btd->bnt", obj.astype(jnp.float32),
                     txt_e.astype(jnp.float32))
    topk = cfg["num_queries"]
    scores = cls.max(-1)
    top_idx = jax.lax.top_k(scores, topk)[1]
    coord_logits = jnp.take_along_axis(
        props_logit + _mlp_head(params["encoder_output_bbox_embed"], obj),
        top_idx[..., None], 1)
    ref_boxes = jax.nn.sigmoid(coord_logits)
    target = jnp.broadcast_to(params["query_position_embeddings"][None],
                              (B, topk, d)).astype(vis.dtype)

    hidden, boxes = decoder_forward(params["decoder"], cfg, target, ref_boxes,
                                    vis, txt_e, shapes, text_token_mask)

    logits = jnp.einsum("bqd,btd->bqt", hidden.astype(jnp.float32),
                        txt_e.astype(jnp.float32))
    logits = jnp.where(text_token_mask[:, None, :], logits, -jnp.inf)
    pad = cfg["max_text_len"] - logits.shape[-1]
    if pad > 0:
        logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    return logits, boxes


_GDINO_JIT: dict = {}


def gdino_forward_jit(params: Params, cfg: dict, pixel_values, input_ids):
    """Cached jitted gdino_forward. Eager per-op execution costs one remote
    dispatch per op on the axon backend — the Swin-T 896² detection
    measured 8.3 s/image eager; ONE compiled program removes that. The
    value-dependent host step (text_masks_and_positions) runs here, before
    the trace; the proposal grids inside depend only on static shapes and
    fold to constants. Cache key = the static cfg (+ jit's own shape
    cache underneath)."""
    key = tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in cfg.items()))
    if key not in _GDINO_JIT:
        _GDINO_JIT[key] = jax.jit(
            lambda p, px, ids, a3, pos, _cfg=dict(cfg): gdino_forward(
                p, _cfg, px, ids, attn3d=a3, pos_ids=pos))
    a3, pos = text_masks_and_positions(np.asarray(input_ids))
    return _GDINO_JIT[key](params, pixel_values, jnp.asarray(input_ids),
                           jnp.asarray(a3), jnp.asarray(pos))


def _gn_conv(p, x, stride: int = 1):
    """input_proj: conv + GroupNorm(32)."""
    k = p["conv"]["weight"]
    pad = k.shape[2] // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=dn)
    y = y + p["conv"]["bias"].astype(y.dtype)[None, :, None, None]
    # GroupNorm(32, C)
    b, c, h, w = y.shape
    groups = min(32, c)
    yf = y.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mu = yf.mean((2, 3, 4), keepdims=True)
    var = ((yf - mu) ** 2).mean((2, 3, 4), keepdims=True)
    yf = ((yf - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(b, c, h, w)
    return (yf * p["gn"]["weight"].astype(jnp.float32)[None, :, None, None]
            + p["gn"]["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_hf_gdino(state_dict, cfg: dict, dtype=jnp.float32) -> Params:
    """Convert a HuggingFace GroundingDinoForObjectDetection state_dict."""
    def g(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t)

    def lin(prefix):
        p = {"weight": jnp.asarray(g(f"{prefix}.weight").T, dtype)}
        if f"{prefix}.bias" in state_dict:
            p["bias"] = jnp.asarray(g(f"{prefix}.bias"), dtype)
        return p

    def lnp(prefix):
        return {"weight": jnp.asarray(g(f"{prefix}.weight"), jnp.float32),
                "bias": jnp.asarray(g(f"{prefix}.bias"), jnp.float32)}

    def mha(prefix):
        return {k: lin(f"{prefix}.{k}") for k in
                ("query", "key", "value", "out_proj")}

    def mlp(prefix, n):
        return {"layers": [lin(f"{prefix}.layers.{j}") for j in range(n)]}

    # ---- swin backbone
    bb = "model.backbone.conv_encoder.model"
    pw = g(f"{bb}.embeddings.patch_embeddings.projection.weight")
    swin: Params = {
        "patch_embed": {"weight": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
                        "bias": jnp.asarray(
                            g(f"{bb}.embeddings.patch_embeddings.projection.bias"), dtype)},
        "patch_norm": lnp(f"{bb}.embeddings.norm"),
        "stages": [],
        "out_norms": [],
    }
    si = 0
    while f"{bb}.encoder.layers.{si}.blocks.0.layernorm_before.weight" in state_dict:
        stage = {"blocks": []}
        bi = 0
        while f"{bb}.encoder.layers.{si}.blocks.{bi}.layernorm_before.weight" in state_dict:
            pre = f"{bb}.encoder.layers.{si}.blocks.{bi}"
            stage["blocks"].append({
                "layernorm_before": lnp(f"{pre}.layernorm_before"),
                "layernorm_after": lnp(f"{pre}.layernorm_after"),
                "attn": {
                    "query": lin(f"{pre}.attention.self.query"),
                    "key": lin(f"{pre}.attention.self.key"),
                    "value": lin(f"{pre}.attention.self.value"),
                    "out_dense": lin(f"{pre}.attention.output.dense"),
                    "relative_position_bias_table": jnp.asarray(
                        g(f"{pre}.attention.self.relative_position_bias_table"), dtype),
                },
                "intermediate_dense": lin(f"{pre}.intermediate.dense"),
                "output_dense": lin(f"{pre}.output.dense"),
            })
            bi += 1
        if f"{bb}.encoder.layers.{si}.downsample.reduction.weight" in state_dict:
            stage["downsample"] = {
                "reduction": lin(f"{bb}.encoder.layers.{si}.downsample.reduction"),
                "norm": lnp(f"{bb}.encoder.layers.{si}.downsample.norm"),
            }
        swin["stages"].append(stage)
        si += 1
    for st in cfg["swin_out_stages"]:
        swin["out_norms"].append(lnp(f"{bb}.hidden_states_norms.stage{st + 1}"))

    # ---- text backbone (BERT)
    tb = "model.text_backbone"
    bert: Params = {
        "embeddings": {
            "word": jnp.asarray(g(f"{tb}.embeddings.word_embeddings.weight"), dtype),
            "position": jnp.asarray(g(f"{tb}.embeddings.position_embeddings.weight"), dtype),
            "token_type": jnp.asarray(g(f"{tb}.embeddings.token_type_embeddings.weight"), dtype),
            "LayerNorm": lnp(f"{tb}.embeddings.LayerNorm"),
        },
        "layers": [],
    }
    li = 0
    while f"{tb}.encoder.layer.{li}.attention.self.query.weight" in state_dict:
        pre = f"{tb}.encoder.layer.{li}"
        bert["layers"].append({
            "q": lin(f"{pre}.attention.self.query"),
            "k": lin(f"{pre}.attention.self.key"),
            "v": lin(f"{pre}.attention.self.value"),
            "attn_out": lin(f"{pre}.attention.output.dense"),
            "attn_ln": lnp(f"{pre}.attention.output.LayerNorm"),
            "inter": lin(f"{pre}.intermediate.dense"),
            "out": lin(f"{pre}.output.dense"),
            "out_ln": lnp(f"{pre}.output.LayerNorm"),
        })
        li += 1

    def deform(prefix):
        return {k: lin(f"{prefix}.{k}") for k in
                ("sampling_offsets", "attention_weights", "value_proj",
                 "output_proj")}

    enc: Params = {"layers": []}
    li = 0
    while f"model.encoder.layers.{li}.fusion_layer.vision_param" in state_dict:
        pre = f"model.encoder.layers.{li}"
        enc["layers"].append({
            "fusion_layer": {
                "layer_norm_vision": lnp(f"{pre}.fusion_layer.layer_norm_vision"),
                "layer_norm_text": lnp(f"{pre}.fusion_layer.layer_norm_text"),
                "vision_param": jnp.asarray(g(f"{pre}.fusion_layer.vision_param"), dtype),
                "text_param": jnp.asarray(g(f"{pre}.fusion_layer.text_param"), dtype),
                "attn": {k: lin(f"{pre}.fusion_layer.attn.{k}") for k in
                         ("vision_proj", "text_proj", "values_vision_proj",
                          "values_text_proj", "out_vision_proj", "out_text_proj")},
            },
            "text_enhancer_layer": {
                "q": lin(f"{pre}.text_enhancer_layer.self_attn.query"),
                "k": lin(f"{pre}.text_enhancer_layer.self_attn.key"),
                "v": lin(f"{pre}.text_enhancer_layer.self_attn.value"),
                "attn_out": lin(f"{pre}.text_enhancer_layer.self_attn.out_proj"),
                "fc1": lin(f"{pre}.text_enhancer_layer.fc1"),
                "fc2": lin(f"{pre}.text_enhancer_layer.fc2"),
                "layer_norm_before": lnp(f"{pre}.text_enhancer_layer.layer_norm_before"),
                "layer_norm_after": lnp(f"{pre}.text_enhancer_layer.layer_norm_after"),
            },
            "deformable_layer": {
                "self_attn": deform(f"{pre}.deformable_layer.self_attn"),
                "self_attn_layer_norm": lnp(f"{pre}.deformable_layer.self_attn_layer_norm"),
                "fc1": lin(f"{pre}.deformable_layer.fc1"),
                "fc2": lin(f"{pre}.deformable_layer.fc2"),
                "final_layer_norm": lnp(f"{pre}.deformable_layer.final_layer_norm"),
            },
        })
        li += 1

    dec: Params = {
        "layers": [],
        "reference_points_head": mlp("model.decoder.reference_points_head", 2),
        "layer_norm": lnp("model.decoder.layer_norm"),
        "bbox_embed": [],
    }
    li = 0
    while f"model.decoder.layers.{li}.self_attn.query.weight" in state_dict:
        pre = f"model.decoder.layers.{li}"
        dec["layers"].append({
            "self_attn": mha(f"{pre}.self_attn"),
            "self_attn_layer_norm": lnp(f"{pre}.self_attn_layer_norm"),
            "encoder_attn_text": mha(f"{pre}.encoder_attn_text"),
            "encoder_attn_text_layer_norm": lnp(f"{pre}.encoder_attn_text_layer_norm"),
            "encoder_attn": deform(f"{pre}.encoder_attn"),
            "encoder_attn_layer_norm": lnp(f"{pre}.encoder_attn_layer_norm"),
            "fc1": lin(f"{pre}.fc1"),
            "fc2": lin(f"{pre}.fc2"),
            "final_layer_norm": lnp(f"{pre}.final_layer_norm"),
        })
        dec["bbox_embed"].append(mlp(f"model.decoder.bbox_embed.{li}", 3))
        li += 1

    n_proj = 0
    input_proj = []
    while f"model.input_proj_vision.{n_proj}.0.weight" in state_dict:
        input_proj.append({
            "conv": {"weight": jnp.asarray(
                g(f"model.input_proj_vision.{n_proj}.0.weight"), dtype),
                "bias": jnp.asarray(
                    g(f"model.input_proj_vision.{n_proj}.0.bias"), dtype)},
            "gn": lnp(f"model.input_proj_vision.{n_proj}.1"),
        })
        n_proj += 1

    return {
        "swin": swin,
        "text_backbone": bert,
        "text_projection": lin("model.text_projection"),
        "input_proj": input_proj,
        "level_embed": jnp.asarray(g("model.level_embed"), jnp.float32),
        "encoder": enc,
        "decoder": dec,
        "enc_output": lin("model.enc_output"),
        "enc_output_norm": lnp("model.enc_output_norm"),
        "encoder_output_bbox_embed": mlp("model.encoder_output_bbox_embed", 3),
        "query_position_embeddings": jnp.asarray(
            g("model.query_position_embeddings.weight"), dtype),
    }


# ---------------------------------------------------------------------------
# grounded post-processing (HF GroundingDinoProcessor semantics)
# ---------------------------------------------------------------------------

def postprocess_grounded_detections(logits, pred_boxes, input_ids,
                                    box_threshold: float = 0.25,
                                    text_threshold: float = 0.25):
    """HF `post_process_grounded_object_detection` semantics
    (processing_grounding_dino.py): score = max sigmoid over text tokens,
    keep > box_threshold; per kept box, the posmap is the set of token
    positions with prob > text_threshold (first and last positions always
    excluded). Boxes are converted cxcywh -> xyxy, still normalized.

    Returns a list of dicts per kept box: {score, box (xyxy normalized),
    token_positions (np int array), probs (over text tokens)}."""
    logits = np.asarray(logits[0], np.float32)
    boxes = np.asarray(pred_boxes[0], np.float32)
    L = np.asarray(input_ids).shape[-1]
    probs = 1.0 / (1.0 + np.exp(-logits[:, :L]))
    scores = probs.max(-1)
    keep = np.where(scores > box_threshold)[0]
    out = []
    for q in keep:
        posmap = probs[q] > text_threshold
        posmap[0] = False
        posmap[L - 1:] = False
        cx, cy, w, h = boxes[q]
        out.append({
            "score": float(scores[q]),
            "box": np.array([cx - w / 2, cy - h / 2,
                             cx + w / 2, cy + h / 2], np.float32),
            "token_positions": np.where(posmap)[0],
            "probs": probs[q],
        })
    out.sort(key=lambda d: -d["score"])
    return out


def phrase_token_spans(tokenizer, phrases):
    """Token-position span [start, end) of each prompt phrase inside the
    '[CLS] p0 . p1 . ... [SEP]' encoding the segmenter builds. Returns
    (input_ids [1, L], spans)."""
    dot = tokenizer.convert_tokens_to_ids(".")
    ids = [tokenizer.cls_token_id]
    spans = []
    for p in phrases:
        toks = tokenizer(p, add_special_tokens=False)["input_ids"]
        spans.append((len(ids), len(ids) + len(toks)))
        ids.extend(toks)
        ids.append(dot)
    ids.append(tokenizer.sep_token_id)
    return np.asarray([ids], np.int64), spans


def assign_phrase(det: dict, spans) -> int:
    """Map a detection's thresholded token posmap to the prompt phrase whose
    span overlaps it most (the grounded-label step the reference gets from
    GroundingDINO's get_phrases_from_posmap + decode,
    grounded_sam2_infer.py:143-150); falls back to the span containing the
    highest-probability token."""
    pos = det["token_positions"]
    overlaps = [np.sum((pos >= s) & (pos < e)) for s, e in spans]
    if pos.size and max(overlaps) > 0:
        return int(np.argmax(overlaps))
    probs = det["probs"]
    span_max = [probs[s:e].max() if e > s else 0.0 for s, e in spans]
    return int(np.argmax(span_max))


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_threshold: float = 0.5) -> list:
    """Class-agnostic NMS, returns kept indices sorted by score."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        x0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return keep
