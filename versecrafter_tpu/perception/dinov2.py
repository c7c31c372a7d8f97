"""DINOv2 ViT backbone, JAX — parity-faithful to the public DINOv2
architecture (validated against HuggingFace Dinov2Model with converted
weights). This is the image backbone of MoGe (DINOv2 ViT-L/14), upgrading
perception/moge.py's generic ViT to a weight-compatible one.

Architecture: patch conv (14x14), cls token, bicubic-interpolated position
embeddings, pre-norm blocks with LayerScale on both residual branches,
final LayerNorm.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

VIT_L14 = dict(hidden=1024, depth=24, heads=16, patch=14, mlp_ratio=4)
TEST_TINY = dict(hidden=32, depth=2, heads=2, patch=14, mlp_ratio=2)


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _lin(p, x):
    return jnp.dot(x, p["weight"].astype(x.dtype)) + p["bias"].astype(x.dtype)


def _bicubic_weights(n_out: int, n_in: int, a: float = -0.75) -> np.ndarray:
    """Torch F.interpolate(mode='bicubic', align_corners=False,
    antialias=False) as an [n_out, n_in] matrix: half-pixel coordinate map,
    cubic-convolution kernel A=-0.75, index clamping at borders."""
    w = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for o in range(n_out):
        x = (o + 0.5) * scale - 0.5
        i0 = math.floor(x)
        for k in range(-1, 3):
            t = abs(x - (i0 + k))
            if t <= 1.0:
                c = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
            elif t < 2.0:
                c = a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
            else:
                c = 0.0
            w[o, min(max(i0 + k, 0), n_in - 1)] += c
    return w.astype(np.float32)


def _interp_pos(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    cls, grid = pos[:, :1], pos[:, 1:]
    side = int(math.sqrt(grid.shape[1]))
    if (gh, gw) == (side, side):
        return pos
    grid = grid.reshape(1, side, side, -1).astype(jnp.float32)
    wh = jnp.asarray(_bicubic_weights(gh, side))
    ww = jnp.asarray(_bicubic_weights(gw, side))
    grid = jnp.einsum("oh,bhwc->bowc", wh, grid)
    grid = jnp.einsum("ow,bhwc->bhoc", ww, grid)
    return jnp.concatenate([cls, grid.reshape(1, gh * gw, -1)], 1).astype(pos.dtype)


def dinov2_forward(params: Params, cfg: dict, pixels: jnp.ndarray,
                   out_layers: Optional[Sequence[int]] = None,
                   norm_taps: bool = False):
    """pixels [B, 3, H, W] (normalized) -> final tokens [B, 1+N, D]
    (+ tapped per-layer tokens when out_layers given; norm_taps applies the
    final LayerNorm to each tap, matching dinov2
    get_intermediate_layers(norm=True) as MoGe consumes it)."""
    b, _, H, W = pixels.shape
    ps = cfg["patch"]
    x = pixels.transpose(0, 2, 3, 1)
    x = x.reshape(b, H // ps, ps, W // ps, ps, 3).transpose(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, (H // ps) * (W // ps), 3 * ps * ps)
    x = _lin(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], 1)
    x = x + _interp_pos(params["pos_embed"], H // ps, W // ps).astype(x.dtype)

    heads = cfg["heads"]
    d = x.shape[-1]
    hd = d // heads
    tapped = {}
    want = set(out_layers or [])
    for i, blk in enumerate(params["layers"]):
        h = _ln(x, blk["norm1"])
        q = _lin(blk["q"], h).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        k = _lin(blk["k"], h).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        v = _lin(blk["v"], h).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bnqd,bnkd->bnqk", q, k) / math.sqrt(hd)
        a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bnqk,bnkd->bnqd", a, v).transpose(0, 2, 1, 3).reshape(b, -1, d)
        o = _lin(blk["proj"], o)
        x = x + blk["ls1"].astype(x.dtype) * o
        h = _ln(x, blk["norm2"])
        h = _lin(blk["fc2"], jax.nn.gelu(_lin(blk["fc1"], h), approximate=False))
        x = x + blk["ls2"].astype(x.dtype) * h
        if i in want:
            tapped[i] = x
    x = _ln(x, params["norm"])
    if out_layers is not None:
        taps = [tapped[i] for i in out_layers]
        if norm_taps:
            taps = [_ln(t, params["norm"]) for t in taps]
        return x, taps
    return x


def convert_hf_dinov2(state_dict, cfg: dict, dtype=jnp.float32) -> Params:
    """Convert a HuggingFace Dinov2Model state_dict."""
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

    pw = g("embeddings.patch_embeddings.projection.weight")  # [D, 3, ps, ps]
    params: Params = {
        "patch_embed": {"weight": jnp.asarray(pw.reshape(pw.shape[0], -1).T, dtype),
                        "bias": jnp.asarray(
                            g("embeddings.patch_embeddings.projection.bias"), dtype)},
        "cls_token": jnp.asarray(g("embeddings.cls_token"), dtype)[0],
        "pos_embed": jnp.asarray(g("embeddings.position_embeddings"), dtype),
        "norm": lnp("layernorm"),
        "layers": [],
    }
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in state_dict:
        pre = f"encoder.layer.{i}"
        params["layers"].append({
            "norm1": lnp(f"{pre}.norm1"),
            "q": lin(f"{pre}.attention.attention.query"),
            "k": lin(f"{pre}.attention.attention.key"),
            "v": lin(f"{pre}.attention.attention.value"),
            "proj": lin(f"{pre}.attention.output.dense"),
            "ls1": jnp.asarray(g(f"{pre}.layer_scale1.lambda1"), dtype),
            "norm2": lnp(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
            "ls2": jnp.asarray(g(f"{pre}.layer_scale2.lambda1"), dtype),
        })
        i += 1
    return params


def convert_fb_dinov2(state_dict, prefix: str = "", dtype=jnp.float32) -> Params:
    """Convert an ORIGINAL facebookresearch/dinov2 state_dict (the layout
    embedded in MoGe checkpoints under `backbone.*`: fused `attn.qkv`,
    `ls1.gamma` LayerScale, `patch_embed.proj` conv)."""
    def g(name):
        t = state_dict[prefix + name]
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t)

    def lnp(name):
        return {"weight": jnp.asarray(g(f"{name}.weight"), jnp.float32),
                "bias": jnp.asarray(g(f"{name}.bias"), jnp.float32)}

    pw = g("patch_embed.proj.weight")  # [D, 3, ps, ps]
    d = pw.shape[0]
    params: Params = {
        "patch_embed": {"weight": jnp.asarray(pw.reshape(d, -1).T, dtype),
                        "bias": jnp.asarray(g("patch_embed.proj.bias"), dtype)},
        "cls_token": jnp.asarray(g("cls_token"), dtype)[0],
        "pos_embed": jnp.asarray(g("pos_embed"), dtype),
        "norm": lnp("norm"),
        "layers": [],
    }
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in state_dict:
        pre = f"blocks.{i}"
        qkv_w = g(f"{pre}.attn.qkv.weight")  # [3D, D]
        qkv_b = g(f"{pre}.attn.qkv.bias")
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        params["layers"].append({
            "norm1": lnp(f"{pre}.norm1"),
            "q": {"weight": jnp.asarray(qw.T, dtype), "bias": jnp.asarray(qb, dtype)},
            "k": {"weight": jnp.asarray(kw.T, dtype), "bias": jnp.asarray(kb, dtype)},
            "v": {"weight": jnp.asarray(vw.T, dtype), "bias": jnp.asarray(vb, dtype)},
            "proj": {"weight": jnp.asarray(g(f"{pre}.attn.proj.weight").T, dtype),
                     "bias": jnp.asarray(g(f"{pre}.attn.proj.bias"), dtype)},
            "ls1": jnp.asarray(g(f"{pre}.ls1.gamma"), dtype),
            "norm2": lnp(f"{pre}.norm2"),
            "fc1": {"weight": jnp.asarray(g(f"{pre}.mlp.fc1.weight").T, dtype),
                    "bias": jnp.asarray(g(f"{pre}.mlp.fc1.bias"), dtype)},
            "fc2": {"weight": jnp.asarray(g(f"{pre}.mlp.fc2.weight").T, dtype),
                    "bias": jnp.asarray(g(f"{pre}.mlp.fc2.bias"), dtype)},
            "ls2": jnp.asarray(g(f"{pre}.ls2.gamma"), dtype),
        })
        i += 1
    return params


def init_dinov2(key, cfg: dict, dtype=jnp.float32) -> Params:
    """Random init with the converted-checkpoint tree structure."""
    ks = iter(jax.random.split(key, 8 + 8 * cfg["depth"]))
    nk = lambda: next(ks)
    d = cfg["hidden"]
    ps = cfg["patch"]
    mlp = int(d * cfg.get("mlp_ratio", 4))

    def dense(cin, cout):
        return {"weight": (jax.random.normal(nk(), (cin, cout))
                           * (2.0 / (cin + cout)) ** 0.5).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def lnp():
        return {"weight": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    return {
        "patch_embed": dense(3 * ps * ps, d),
        "cls_token": (jax.random.normal(nk(), (1, d)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(nk(), (1, 1 + 16 * 16, d)) * 0.02).astype(dtype),
        "norm": lnp(),
        "layers": [{
            "norm1": lnp(),
            "q": dense(d, d), "k": dense(d, d), "v": dense(d, d),
            "proj": dense(d, d),
            "ls1": jnp.full((d,), 1e-5, dtype),
            "norm2": lnp(),
            "fc1": dense(d, mlp), "fc2": dense(mlp, d),
            "ls2": jnp.full((d,), 1e-5, dtype),
        } for _ in range(cfg["depth"])],
    }
