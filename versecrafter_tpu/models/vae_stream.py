"""Streaming (temporally chunked) VAE encode/decode with exact conv caches.

Full-sequence VAE processing at the canonical 480p x 81f needs ~31 GB of
HBM (2x a v5e chip). Because every temporal op in the VAE is causal, the
sequence can be processed in chunks of [1, 4, 4, ...] input frames (matching
the 4x temporal compression) with each temporal conv carrying a small cache
of its trailing input frames — numerically IDENTICAL to full-sequence
processing (tested), with peak memory ~T/4 smaller. This is the TPU-native
equivalent of the upstream Wan VAE's feat_cache chunk loop, restructured as
two jitted programs (first chunk + steady chunk) threading a cache pytree.

Cache rules (derived from the causal pad-2 / stride geometry):
- stride-1 k3 conv: cache = last 2 input frames (zeros before start);
- stride-2 k3 conv (temporal downsample): steady chunks start at odd global
  offsets, so the correct phase needs exactly the last 1 input frame;
  the first chunk uses the plain causal pad;
- temporal upsample: first chunk drops the duplicated first output frame.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from versecrafter_tpu.core.config import VAEConfig
from versecrafter_tpu.models.vae import (
    WAN21_LATENT_MEAN, WAN21_LATENT_STD, _attn_block, _silu, causal_conv3d,
    channel_rms_norm, conv2d_spatial)

Params = Dict[str, Any]
Cache = Dict[str, Any]


def _cconv_stream(x, p, cache, stride_t: int = 1):
    """Cached causal conv3d. cache None => first chunk (zero pad)."""
    kernel, bias = p["kernel"], p["bias"]
    kt = kernel.shape[2]
    if kt == 1:
        return causal_conv3d(x, kernel, bias, (stride_t, 1, 1)), None
    keep = 2 if stride_t == 1 else 1
    if cache is None:
        y = causal_conv3d(x, kernel, bias, (stride_t, 1, 1))
        xx = x
    else:
        xx = jnp.concatenate([cache.astype(x.dtype), x], axis=2)
        kh, kw = kernel.shape[3:]
        xp = jnp.pad(xx, ((0, 0), (0, 0), (0, 0),
                          (kh // 2, kh // 2), (kw // 2, kw // 2)))
        dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape,
                                            ("NCDHW", "OIDHW", "NCDHW"))
        y = jax.lax.conv_general_dilated(
            xp, kernel.astype(x.dtype), (stride_t, 1, 1), "VALID",
            dimension_numbers=dn)
        y = y + bias.astype(y.dtype)[None, :, None, None, None]
    new_cache = xx[:, :, -keep:]
    if cache is None and new_cache.shape[2] < keep:
        pad = keep - new_cache.shape[2]
        new_cache = jnp.pad(new_cache, ((0, 0), (0, 0), (pad, 0), (0, 0), (0, 0)))
    return y, new_cache


def _res_stream(p, x, cache: Optional[Cache]):
    c = cache or {}
    h = channel_rms_norm(x, p["norm1"]["gamma"])
    h, c1 = _cconv_stream(_silu(h), p["conv1"], c.get("conv1"))
    h = channel_rms_norm(h, p["norm2"]["gamma"])
    h, c2 = _cconv_stream(_silu(h), p["conv2"], c.get("conv2"))
    if "shortcut" in p:
        x = causal_conv3d(x, p["shortcut"]["kernel"], p["shortcut"]["bias"])
    return x + h, {"conv1": c1, "conv2": c2}


def _down_stream(p, x, cache: Optional[Cache], temporal: bool):
    c = cache or {}
    x = conv2d_spatial(x, p["conv"]["kernel"], p["conv"]["bias"], stride=2,
                       asym_pad=True)
    out_cache: Cache = {}
    if temporal:
        x, tc = _cconv_stream(x, p["time_conv"], c.get("time_conv"), stride_t=2)
        out_cache["time_conv"] = tc
    return x, out_cache


def _up_stream(p, x, cache: Optional[Cache], temporal: bool, first: bool):
    c = cache or {}
    out_cache: Cache = {}
    if temporal:
        b, ch, t, h, w = x.shape
        y, tc = _cconv_stream(x, p["time_conv"], c.get("time_conv"))
        out_cache["time_conv"] = tc
        y = y.reshape(b, 2, ch, t, h, w).transpose(0, 2, 3, 1, 4, 5)
        x = y.reshape(b, ch, 2 * t, h, w)
        if first:
            x = x[:, :, 1:]  # drop the duplicated first frame
    b, ch, t, h, w = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
    return conv2d_spatial(x, p["conv"]["kernel"], p["conv"]["bias"]), out_cache


# ---------------------------------------------------------------------------
# encoder / decoder single-chunk programs
# ---------------------------------------------------------------------------

def _encode_chunk(params: Params, cfg: VAEConfig, x: jnp.ndarray,
                  caches: Optional[Cache]):
    p = params["encoder"]
    cc = caches or {}
    new: Cache = {}
    h, new["conv_in"] = _cconv_stream(x, p["conv_in"], cc.get("conv_in"))
    for i, st in enumerate(p["stages"]):
        sc = cc.get(f"s{i}", {})
        nsc: Cache = {}
        for j, rp in enumerate(st["res"]):
            h, nsc[f"res{j}"] = _res_stream(rp, h, sc.get(f"res{j}"))
        if "down" in st:
            h, nsc["down"] = _down_stream(st["down"], h, sc.get("down"),
                                          temporal="time_conv" in st["down"])
        new[f"s{i}"] = nsc
    h, new["mid1"] = _res_stream(p["mid"]["res1"], h, cc.get("mid1"))
    h = _attn_block(p["mid"]["attn"], h)
    h, new["mid2"] = _res_stream(p["mid"]["res2"], h, cc.get("mid2"))
    h = channel_rms_norm(h, p["norm_out"]["gamma"])
    h, new["conv_out"] = _cconv_stream(_silu(h), p["conv_out"], cc.get("conv_out"))
    h = causal_conv3d(h, p["quant_conv"]["kernel"], p["quant_conv"]["bias"])
    mean, _ = jnp.split(h, 2, axis=1)
    if cfg.use_latent_stats:
        mean = (mean - WAN21_LATENT_MEAN[None, :, None, None, None].astype(mean.dtype)) \
            / WAN21_LATENT_STD[None, :, None, None, None].astype(mean.dtype)
    return mean, new


def _decode_chunk(params: Params, cfg: VAEConfig, z: jnp.ndarray,
                  caches: Optional[Cache], first: bool):
    p = params["decoder"]
    cc = caches or {}
    new: Cache = {}
    if cfg.use_latent_stats:
        z = z * WAN21_LATENT_STD[None, :, None, None, None].astype(z.dtype) \
            + WAN21_LATENT_MEAN[None, :, None, None, None].astype(z.dtype)
    h = causal_conv3d(z, p["post_quant_conv"]["kernel"], p["post_quant_conv"]["bias"])
    h, new["conv_in"] = _cconv_stream(h, p["conv_in"], cc.get("conv_in"))
    h, new["mid1"] = _res_stream(p["mid"]["res1"], h, cc.get("mid1"))
    h = _attn_block(p["mid"]["attn"], h)
    h, new["mid2"] = _res_stream(p["mid"]["res2"], h, cc.get("mid2"))
    t_up = cfg.temporal_downsample[::-1]
    n_stage = len(p["stages"])
    for i, st in enumerate(p["stages"]):
        sc = cc.get(f"s{i}", {})
        nsc: Cache = {}
        for j, rp in enumerate(st["res"]):
            h, nsc[f"res{j}"] = _res_stream(rp, h, sc.get(f"res{j}"))
        if "up" in st:
            temporal = (t_up[i] if i < len(t_up) else False) and \
                "time_conv" in st["up"]
            h, nsc["up"] = _up_stream(st["up"], h, sc.get("up"),
                                      temporal=temporal, first=first)
        new[f"s{i}"] = nsc
    h = channel_rms_norm(h, p["norm_out"]["gamma"])
    h, new["conv_out"] = _cconv_stream(_silu(h), p["conv_out"], cc.get("conv_out"))
    return h, new


# ---------------------------------------------------------------------------
# chunked drivers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _encode_fns(cfg: VAEConfig):
    # cfg is a frozen dataclass — cache the jit wrappers so repeat
    # generations don't re-trace the conv graphs (seconds of host work;
    # fresh jax.jit objects never reuse their trace cache)
    return (jax.jit(lambda p, c: _encode_chunk(p, cfg, c, None)),
            jax.jit(lambda p, c, cs: _encode_chunk(p, cfg, c, cs)))


@functools.lru_cache(maxsize=None)
def _decode_fns(cfg: VAEConfig):
    return (jax.jit(lambda p, c: _decode_chunk(p, cfg, c, None, True)),
            jax.jit(lambda p, c, cs: _decode_chunk(p, cfg, c, cs, False)))


def vae_encode_chunked(params: Params, cfg: VAEConfig, x: jnp.ndarray,
                       frame_chunk: int = 4) -> jnp.ndarray:
    """Exact streaming encode: [B,3,T,H,W] (T = 1+4k) -> latents.
    Peak memory is O(frame_chunk) frames instead of O(T)."""
    T = x.shape[2]
    tc = cfg.temporal_compression_ratio
    assert frame_chunk % tc == 0, "chunk must be a multiple of temporal ratio"
    first, steady = _encode_fns(cfg)

    z0, caches = first(params, x[:, :, :1])
    outs = [z0]
    for s in range(1, T, frame_chunk):
        zc, caches = steady(params, x[:, :, s:s + frame_chunk], caches)
        outs.append(zc)
    return jnp.concatenate(outs, axis=2)


def vae_decode_stream(params: Params, cfg: VAEConfig, z: jnp.ndarray,
                      latent_chunk: int = 1):
    """Yield per-chunk decoded pixel tensors (device arrays, temporal
    order) — the overlap-friendly form: the caller can download chunk N
    while chunk N+1 decodes (pipeline.decode_latents does exactly that;
    the same worker-thread pattern as geometry/render.py's batches)."""
    T = z.shape[2]
    first, steady = _decode_fns(cfg)

    y0, caches = first(params, z[:, :, :1])
    yield y0
    for s in range(1, T, latent_chunk):
        yc, caches = steady(params, z[:, :, s:s + latent_chunk], caches)
        yield yc


def vae_decode_chunked(params: Params, cfg: VAEConfig, z: jnp.ndarray,
                       latent_chunk: int = 1) -> jnp.ndarray:
    """Exact streaming decode: latents [B,z,T',h,w] -> video [B,3,4(T'-1)+1,H,W]."""
    return jnp.concatenate(
        list(vae_decode_stream(params, cfg, z, latent_chunk)), axis=2)
