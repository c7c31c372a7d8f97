"""Wan 3D causal video VAE, TPU-native.

Re-implements the capability the reference consumes as `AutoencoderKLWan`
(/root/reference/config/wan2.1/wan_civitai.yaml:9-12; used by the pipeline at
pipeline_wan_versecrafter.py:420,432,526-528 `.encode(x)[0].mode()` and :551
`.decode(latents).sample`):

- video [B, 3, T, H, W] in [-1, 1] -> latents [B, 16, (T-1)/4+1, H/8, W/8]
- causal 3D convs (temporal padding only on the past side), so frame t's
  latent depends only on frames <= t (streaming-friendly);
- encoder: stem conv, 4 stages (dim_mult 1/2/4/4, 2 res blocks each) with
  spatial downsample after stages 0-2 and temporal downsample after 1-2,
  middle res-attn-res, head -> 2*z channels (mean | logvar); mode() = mean;
- per-channel latent standardization (Wan publishes latent mean/std);
- decoder mirrors with temporal upsampling producing 2t-1 frames per stage
  (first frame is not duplicated).

TPU-first choices: the whole sequence is processed in one XLA program
(no python feat_cache chunk loop like the reference's upstream VAE — the
causal padding makes full-sequence numerically identical to cached
chunking); temporal upsample drops the duplicated first frame explicitly.
Weight conversion from the torch checkpoint maps conv kernels OIDHW -> HWIO
equivalents in core/convert.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from versecrafter_tpu.core.config import VAEConfig

Params = Dict[str, Any]

# Wan2.1 public per-channel latent statistics (mean, std) for z_dim=16.
WAN21_LATENT_MEAN = jnp.asarray([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], jnp.float32)
WAN21_LATENT_STD = jnp.asarray([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], jnp.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def causal_conv3d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                  stride: Tuple[int, int, int] = (1, 1, 1)) -> jnp.ndarray:
    """Conv3d NCDHW with causal temporal padding (2*(kT//2) on the past side,
    none on the future side) and symmetric spatial padding."""
    kt, kh, kw = kernel.shape[2:]
    pad_t = 2 * (kt // 2)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_t, 0),
                    (kh // 2, kh // 2), (kw // 2, kw // 2)))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NCDHW", "OIDHW", "NCDHW"))
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride, padding="VALID",
        dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None, None, None]
    return y


def conv2d_spatial(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                   stride: int = 1, asym_pad: bool = False) -> jnp.ndarray:
    """Per-frame 2D conv on [B, C, T, H, W]. asym_pad: (0,1,0,1) zero padding
    used before stride-2 downsampling."""
    b, c, t, h, w = x.shape
    kh, kw = kernel.shape[2:]
    if asym_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)))
    xb = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, x.shape[3], x.shape[4])
    dn = jax.lax.conv_dimension_numbers(xb.shape, kernel.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(xb, kernel.astype(x.dtype), (stride, stride),
                                     "VALID", dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None, None]
    _, co, ho, wo = y.shape
    return y.reshape(b, t, co, ho, wo).transpose(0, 2, 1, 3, 4)


def channel_rms_norm(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """RMS norm over the channel axis of NCDHW (the upstream Wan VAE's
    RMS_norm: F.normalize over channels * sqrt(C) * gamma)."""
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + 1e-12)
    return (xf * scale * gamma.astype(jnp.float32)[None, :, None, None, None]).astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _res_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = channel_rms_norm(x, p["norm1"]["gamma"])
    h = causal_conv3d(_silu(h), p["conv1"]["kernel"], p["conv1"]["bias"])
    h = channel_rms_norm(h, p["norm2"]["gamma"])
    h = causal_conv3d(_silu(h), p["conv2"]["kernel"], p["conv2"]["bias"])
    if "shortcut" in p:
        x = causal_conv3d(x, p["shortcut"]["kernel"], p["shortcut"]["bias"])
    return x + h


def _attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head self-attention over spatial positions, per frame."""
    b, c, t, h, w = x.shape
    res = x
    xn = channel_rms_norm(x, p["norm"]["gamma"])
    flat = xn.transpose(0, 2, 3, 4, 1).reshape(b * t, h * w, c)
    qkv = jnp.dot(flat, p["qkv"]["kernel"].astype(flat.dtype)) + p["qkv"]["bias"].astype(flat.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    s = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = jax.nn.softmax(s / math.sqrt(c), axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", s, v.astype(jnp.float32)).astype(flat.dtype)
    o = jnp.dot(o, p["proj"]["kernel"].astype(o.dtype)) + p["proj"]["bias"].astype(o.dtype)
    return res + o.reshape(b, t, h, w, c).transpose(0, 4, 1, 2, 3)


def _downsample(p: Params, x: jnp.ndarray, temporal: bool) -> jnp.ndarray:
    x = conv2d_spatial(x, p["conv"]["kernel"], p["conv"]["bias"], stride=2, asym_pad=True)
    if temporal:
        x = causal_conv3d(x, p["time_conv"]["kernel"], p["time_conv"]["bias"],
                          stride=(2, 1, 1))
    return x


def _upsample(p: Params, x: jnp.ndarray, temporal: bool) -> jnp.ndarray:
    """Temporal interleave (2t-1 frames) then nearest-2x spatial + conv.
    The conv HALVES channels (dim -> dim//2), matching the public Wan VAE
    decoder layout so torch checkpoints convert 1:1."""
    if temporal:
        # time conv emits 2C channels = (frame 2t, frame 2t+1); interleave and
        # drop the duplicated first frame: T -> 2T-1.
        b, c, t, h, w = x.shape
        y = causal_conv3d(x, p["time_conv"]["kernel"], p["time_conv"]["bias"])
        y = y.reshape(b, 2, c, t, h, w).transpose(0, 2, 3, 1, 4, 5).reshape(b, c, 2 * t, h, w)
        x = y[:, :, 1:]
    b, c, t, h, w = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)  # nearest 2x
    return conv2d_spatial(x, p["conv"]["kernel"], p["conv"]["bias"])


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv3d(key, cin, cout, k: Tuple[int, int, int], dtype):
    fan_in = cin * math.prod(k)
    w = jax.random.normal(key, (cout, cin, *k)) * (1.0 / math.sqrt(fan_in))
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _init_conv2d(key, cin, cout, k: int, dtype):
    fan_in = cin * k * k
    w = jax.random.normal(key, (cout, cin, k, k)) * (1.0 / math.sqrt(fan_in))
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _init_dense(key, cin, cout, dtype):
    w = jax.random.normal(key, (cin, cout)) * (1.0 / math.sqrt(cin))
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _init_res(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin,), jnp.float32)},
        "conv1": _init_conv3d(ks[0], cin, cout, (3, 3, 3), dtype),
        "norm2": {"gamma": jnp.ones((cout,), jnp.float32)},
        "conv2": _init_conv3d(ks[1], cout, cout, (3, 3, 3), dtype),
    }
    if cin != cout:
        p["shortcut"] = _init_conv3d(ks[2], cin, cout, (1, 1, 1), dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 2)
    return {
        "norm": {"gamma": jnp.ones((c,), jnp.float32)},
        "qkv": _init_dense(ks[0], c, 3 * c, dtype),
        "proj": _init_dense(ks[1], c, c, dtype),
    }


def init_vae(key: jax.Array, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32) -> Params:
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    kiter = iter(jax.random.split(key, 256))
    nk = lambda: next(kiter)

    enc: Params = {"conv_in": _init_conv3d(nk(), 3, dims[0], (3, 3, 3), dtype)}
    cin = dims[0]
    stages = []
    for i, d in enumerate(dims):
        st: Params = {"res": []}
        for _ in range(cfg.num_res_blocks):
            st["res"].append(_init_res(nk(), cin, d, dtype))
            cin = d
        if i != len(dims) - 1:
            st["down"] = {"conv": _init_conv2d(nk(), d, d, 3, dtype)}
            if cfg.temporal_downsample[i]:
                st["down"]["time_conv"] = _init_conv3d(nk(), d, d, (3, 1, 1), dtype)
        stages.append(st)
    enc["stages"] = stages
    enc["mid"] = {
        "res1": _init_res(nk(), cin, cin, dtype),
        "attn": _init_attn(nk(), cin, dtype),
        "res2": _init_res(nk(), cin, cin, dtype),
    }
    enc["norm_out"] = {"gamma": jnp.ones((cin,), jnp.float32)}
    enc["conv_out"] = _init_conv3d(nk(), cin, 2 * cfg.z_dim, (3, 3, 3), dtype)
    # 1x1 post/pre quant convs (AutoencoderKL layout)
    enc["quant_conv"] = _init_conv3d(nk(), 2 * cfg.z_dim, 2 * cfg.z_dim, (1, 1, 1), dtype)

    # decoder dims follow the public Wan layout: [last, *reversed(dim_mult)],
    # with each upsample conv halving channels (decoder Resample semantics)
    rdims = [cfg.base_dim * m
             for m in ([cfg.dim_mult[-1]] + list(cfg.dim_mult[::-1]))]
    dec: Params = {
        "post_quant_conv": _init_conv3d(nk(), cfg.z_dim, cfg.z_dim, (1, 1, 1), dtype),
        "conv_in": _init_conv3d(nk(), cfg.z_dim, rdims[0], (3, 3, 3), dtype),
        "mid": {
            "res1": _init_res(nk(), rdims[0], rdims[0], dtype),
            "attn": _init_attn(nk(), rdims[0], dtype),
            "res2": _init_res(nk(), rdims[0], rdims[0], dtype),
        },
    }
    ustages = []
    t_up = cfg.temporal_downsample[::-1]
    n_stage = len(rdims) - 1
    for i in range(n_stage):
        cin = rdims[i] if i == 0 else rdims[i] // 2
        out = rdims[i + 1]
        st = {"res": []}
        for _ in range(cfg.num_res_blocks + 1):
            st["res"].append(_init_res(nk(), cin, out, dtype))
            cin = out
        if i != n_stage - 1:
            temporal = t_up[i] if i < len(t_up) else False
            st["up"] = {"conv": _init_conv2d(nk(), out, out // 2, 3, dtype)}
            if temporal:
                st["up"]["time_conv"] = _init_conv3d(nk(), out, 2 * out, (3, 1, 1), dtype)
        ustages.append(st)
    dec["stages"] = ustages
    head_dim = rdims[-1]
    dec["norm_out"] = {"gamma": jnp.ones((head_dim,), jnp.float32)}
    dec["conv_out"] = _init_conv3d(nk(), head_dim, 3, (3, 3, 3), dtype)

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def vae_encode(params: Params, cfg: VAEConfig, x: jnp.ndarray,
               sample: bool = False, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """[B, 3, T, H, W] in [-1,1] -> latents [B, z, (T-1)/4+1, H/8, W/8].

    mode() semantics by default (the pipeline always takes the mode,
    pipeline_wan_versecrafter.py:420): returns the distribution mean,
    standardized by the Wan latent statistics."""
    p = params["encoder"]
    h = causal_conv3d(x, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    for i, st in enumerate(p["stages"]):
        for rp in st["res"]:
            h = _res_block(rp, h)
        if "down" in st:
            h = _downsample(st["down"], h, temporal="time_conv" in st["down"])
    h = _res_block(p["mid"]["res1"], h)
    h = _attn_block(p["mid"]["attn"], h)
    h = _res_block(p["mid"]["res2"], h)
    h = channel_rms_norm(h, p["norm_out"]["gamma"])
    h = causal_conv3d(_silu(h), p["conv_out"]["kernel"], p["conv_out"]["bias"])
    h = causal_conv3d(h, p["quant_conv"]["kernel"], p["quant_conv"]["bias"])
    mean, logvar = jnp.split(h, 2, axis=1)
    if sample:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    if cfg.use_latent_stats:
        mean = (mean - WAN21_LATENT_MEAN[None, :, None, None, None].astype(mean.dtype)) \
            / WAN21_LATENT_STD[None, :, None, None, None].astype(mean.dtype)
    return mean


def vae_decode(params: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """latents [B, z, T', H', W'] -> video [B, 3, 4*(T'-1)+1, 8H', 8W'] in [-1,1]."""
    p = params["decoder"]
    if cfg.use_latent_stats:
        z = z * WAN21_LATENT_STD[None, :, None, None, None].astype(z.dtype) \
            + WAN21_LATENT_MEAN[None, :, None, None, None].astype(z.dtype)
    h = causal_conv3d(z, p["post_quant_conv"]["kernel"], p["post_quant_conv"]["bias"])
    h = causal_conv3d(h, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    h = _res_block(p["mid"]["res1"], h)
    h = _attn_block(p["mid"]["attn"], h)
    h = _res_block(p["mid"]["res2"], h)
    for st in p["stages"]:
        for rp in st["res"]:
            h = _res_block(rp, h)
        if "up" in st:
            h = _upsample(st["up"], h, temporal="time_conv" in st["up"])
    h = channel_rms_norm(h, p["norm_out"]["gamma"])
    h = causal_conv3d(_silu(h), p["conv_out"]["kernel"], p["conv_out"]["bias"])
    return h  # linear output head; the pipeline maps to [0,1] and clamps


def latent_frames(num_frames: int, cfg: VAEConfig = VAEConfig()) -> int:
    return (num_frames - 1) // cfg.temporal_compression_ratio + 1
