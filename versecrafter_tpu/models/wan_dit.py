"""Wan video DiT backbone + GeoAdapter control branch, TPU-native.

Re-implements the behavior of the reference models
(/root/reference/versecrafter/models/wan_transformer3d.py:663-1124 — patch
embed, 3D RoPE, N x [AdaLN self-attn / T5 cross-attn / FFN] blocks, head,
unpatchify; and wan_transformer3d_versecrafter.py:151-442 — GeoAdapter
blocks with zero-init before/after projections injecting per-layer hints)
with a TPU-first architecture:

- dense [B, C, F, H, W] batches and static shapes (the reference's ragged
  list-of-tensors + manual pad/chunk bookkeeping is GSPMD's job now);
- patch embedding as reshape+matmul (stride==kernel makes conv3d a matmul —
  pure MXU work instead of a convolution);
- `lax.scan` over stacked per-layer params (fast compiles at 40 layers);
- GeoAdapter hints computed *interleaved* with base blocks: geoada block i
  runs immediately before base block 2i, so only ONE hint is alive at a
  time instead of the reference's `len(geoada_layers)` stacked full-sequence
  hints (wan_transformer3d_versecrafter.py:254-292) — identical numerics,
  O(1) activation memory;
- fp32 for time embeddings / norms / modulation math (matching the
  reference's autocast boundaries at wan_transformer3d.py:1014-1030), bf16
  matmuls on the MXU.

Params are plain pytrees (nested dicts of jnp arrays); block params carry a
leading layer axis. See core/convert.py for torch-checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.kernels.flash_attention import (
    flash_attention, fused_rms_cross_attention, fused_rope_rms_attention,
    resident_kv_available, fused_tables_blocked)
from versecrafter_tpu.kernels.matmul_stat import linear_rstat
from versecrafter_tpu.kernels.norms import layer_norm, rms_norm
from versecrafter_tpu.kernels.rope import apply_rope

Params = Dict[str, Any]

# Whether the scanned DiT blocks route self-attention through the fused
# qk-RMSNorm+RoPE kernel. Measured on the v5e at 32,760 tok (round 3):
# the PLAIN (no-geoadapter) 1.3B step wins -205 ms/step (3.82 -> 3.61 s,
# rope/rms/relayout passes eliminated) with the kernel's STREAMING flavor,
# and GeoAdapter programs win -419 ms/step (5.65 -> 5.23 s) with its
# RESIDENT-KV flavor. The streaming flavor inside geoada programs is the
# one regressing combination (+70-110 ms — its strided flat-layout K/V
# re-streaming is context-sensitive; device-trace evidence in
# scripts/trace_fused_geoada.py), so geoada programs fuse only where the
# dispatch will run resident (resident_kv_available). With the
# blocked-rope-tables + tile-mapped-k-stats variant the resident mode now
# also covers 720p's 75,600 tokens (block_q 2048; chip parity 3.7e-4,
# scripts/check_fused_parity_chip.py --res 720). GEOADA_FUSED_QK=True
# force-fuses geoada even in streaming mode, for experiments.
FUSED_QK_ATTENTION = True
GEOADA_FUSED_QK = False

# Force plain models to fuse even where the dispatch needs blocked rope
# tables (~720p): chip-measured +699 ms/step there (vs geoada's -568 ms win
# — bench_fused_ablation --res 720), so production keeps this off; the
# ablation script flips it to reproduce the measurement.
PLAIN_FUSED_AT_BLOCKED = False

# Route cross-attention through the norm-only fused kernel
# (fused_rms_cross_attention): removes the q-RMS pass over the video axis
# and both relayouts. Measured on the v5e at 32,760 tok CFG-2
# (scripts/bench_fused_ablation.py --cross): plain -66.6 ms/step
# (3614.5 -> 3547.9), geoada -98.8 ms/step (5742.2 -> 5643.4), exact
# bf16 parity — unlike the rope-table fusion, this one also wins inside
# geoada programs, so it is gated independently of GEOADA_FUSED_QK.
FUSED_CROSS_ATTENTION = True

# Inference geoada hint schedule: False = interleaved superstep (O(1) hint
# memory, also the training path), True = reference-order stacked hints
# (two plain single-block scans; +~27 ms/step measured). Built while
# chasing the fused-kernel regression — the trace diagnosis showed scan
# structure was never the cause (the resident-KV kernel mode was the fix),
# so the interleaved superstep stays the default everywhere.
GEOADA_STACKED_HINTS = False

# Quantize the transformed q/k tiles to int8 inside the fused attention
# kernel and score QK^T as s8 x s8 -> s32 MXU dots (~2x bf16 rate on v5e;
# per-row scales, PV stays bf16 — SageAttention-style, inference-only
# approximation). OPT-IN: ~1/127-relative score noise is softmax-damped but
# not exact; enable via pipeline.enable_int8_attention() / CLI
# --int8_attention / serving param int8_attention after judging quality at
# the operating point.
INT8_QK_SCORE = False

# Compute the qk-RMS row statistics in the q/k projection matmul epilogues
# (kernels/matmul_stat.linear_rstat) instead of as standalone [B,S,D]->[B,S,1]
# passes. MEASURED OFF on the chip: when the stat consumer sits in the same
# jitted program as the projection, XLA already fuses the row reduce into
# the dot's epilogue (scripts/bench_matmul_stat.py: xla dot+stat 3.46 ms vs
# bare dot 3.80 at 65,520x1536x1536 — the "standalone ~2 ms stat wall" only
# exists for a stat pass with no adjacent producer), so the pallas kernel's
# best case is ~0.02-0.13 ms/call while replacing jnp.dot with a custom
# call BREAKS XLA's modulate->projection fusions and costs +58 ms/step at
# 32,760 tok (bench_fused_ablation --proj_stat, round 3). Same verdict as
# the reverted standalone row-stat kernel: keep as an opt-in experiment.
# Only applies on the fused-attention path with plain (unquantized) kernels.
PROJ_STAT_FUSION = False


# ---------------------------------------------------------------------------
# small functional layers
# ---------------------------------------------------------------------------

def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    k = p["kernel"]
    if isinstance(k, dict):
        from versecrafter_tpu.utils.quantize import (
            dequantize_leaf, int8_compute_dot, is_compute_tagged)
        if is_compute_tagged(k):
            # W8A8 compute-tagged kernel (utils.quantize.tag_int8_compute):
            # s8 x s8 -> s32 on the MXU at ~2x bf16 throughput
            y = int8_compute_dot(k, x)
        else:
            # storage-only leaf that a caller didn't pre-dequantize
            # (int8 or nibble-packed int4): weight-only dequant in-graph
            y = jnp.dot(x, dequantize_leaf(k, x.dtype))
    else:
        y = jnp.dot(x, k.astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# Chunk the block FFN over tokens above this many rows: at 720p x 81f
# (75,600 tok) the [S, ffn_dim] hidden is 1.95 GB bf16 (or ~1 GB as the
# fused s8 for a W8A8 ffn_out) and its projection epilogues another
# 1.4 GB f32 — the allocations that pushed the 14B GeoAdapter CFG-1 step
# past the 15.75 GB v5e HBM. Rows are independent through
# linear->gelu->linear, so ~15k-row chunks are numerically identical
# (per-row/static int8 scales are row-local) and the hidden never fully
# materializes. The gate sits ABOVE the chip-measured-and-fitting 480p
# shapes (CFG-2 = 65,520 rows) so those programs compile unchanged; only
# the 720p shapes (75,600+ rows) chunk.
FFN_CHUNK_ROWS = 70_000


def _ffn_chunked(p: Params, tmp: jnp.ndarray) -> jnp.ndarray:
    """ffn_out(gelu(ffn_in(x))) over token chunks via fori_loop +
    dynamic slices (NOT lax.map, whose stacked input materializes extra
    full-size copies); the carried output updates in place."""
    b, s, d = tmp.shape
    rows = b * s
    # ~9k-row chunks: the [chunk, ffn_dim] hidden stays ~0.24 GB bf16 and
    # the dots are still far above MXU-saturating sizes
    n = -(-rows // max(1, FFN_CHUNK_ROWS // 8))
    ch = -(-rows // n)
    x2 = tmp.reshape(rows, d)
    if n * ch != rows:
        x2 = jnp.pad(x2, ((0, n * ch - rows), (0, 0)))
    out = jnp.zeros_like(x2)

    def body(i, out):
        xc = jax.lax.dynamic_slice_in_dim(x2, i * ch, ch, 0)
        yc = _linear(p["ffn_out"], _gelu_tanh(_linear(p["ffn_in"], xc)))
        return jax.lax.dynamic_update_slice_in_dim(out, yc, i * ch, 0)

    out = jax.lax.fori_loop(0, n, body, out)
    return out[:rows].reshape(b, s, d)


def _amax(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor activation absmax (fp32 scalar) — the statistic behind
    calibrated static W8A8 scales (utils.quantize.fit_act_scales)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoid table (wan_transformer3d.py:39-49), fp32."""
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    ang = jnp.outer(pos, freqs)
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


# ---------------------------------------------------------------------------
# patchify / unpatchify
# ---------------------------------------------------------------------------

def patchify(x: jnp.ndarray, patch_size: Tuple[int, int, int]) -> jnp.ndarray:
    """[B, C, F, H, W] -> [B, S, C*pt*ph*pw] with patch channels ordered
    (c, pt, ph, pw) to match a conv3d(kernel=stride=patch) inner product."""
    b, c, f, h, w = x.shape
    pt, ph, pw = patch_size
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    # -> [B, F', H', W', C, pt, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(x: jnp.ndarray, grid: Tuple[int, int, int],
               patch_size: Tuple[int, int, int], out_dim: int) -> jnp.ndarray:
    """[B, S, out_dim*prod(patch)] -> [B, C_out, F, H, W]
    (reference unpatchify einsum 'fhwpqrc->cfphqwr',
    wan_transformer3d.py:1127-1150)."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # b c f pt h ph w pw
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, dtype, init="xavier", zero=False, bias=True):
    kkey, _ = jax.random.split(key)
    if zero:
        kernel = jnp.zeros((d_in, d_out), dtype)
    elif init == "normal02":
        kernel = (jax.random.normal(kkey, (d_in, d_out)) * 0.02).astype(dtype)
    else:  # xavier uniform
        lim = math.sqrt(6.0 / (d_in + d_out))
        kernel = jax.random.uniform(kkey, (d_in, d_out), minval=-lim, maxval=lim).astype(dtype)
    p = {"kernel": kernel}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _init_attn(key, dim, dtype, qk_norm=True):
    ks = jax.random.split(key, 4)
    p = {
        "q": _init_linear(ks[0], dim, dim, dtype),
        "k": _init_linear(ks[1], dim, dim, dtype),
        "v": _init_linear(ks[2], dim, dim, dtype),
        "o": _init_linear(ks[3], dim, dim, dtype),
    }
    if qk_norm:
        p["norm_q"] = {"scale": jnp.ones((dim,), jnp.float32)}
        p["norm_k"] = {"scale": jnp.ones((dim,), jnp.float32)}
    return p


def _init_block(key, cfg: WanDiTConfig, dtype, geoada: bool = False,
                geoada_first: bool = False):
    ks = jax.random.split(key, 6)
    p = {
        "self_attn": _init_attn(ks[0], cfg.dim, dtype, cfg.qk_norm),
        "cross_attn": _init_attn(ks[1], cfg.dim, dtype, cfg.qk_norm),
        "ffn_in": _init_linear(ks[2], cfg.dim, cfg.ffn_dim, dtype),
        "ffn_out": _init_linear(ks[3], cfg.ffn_dim, cfg.dim, dtype),
        "modulation": (jax.random.normal(ks[4], (6, cfg.dim)) / math.sqrt(cfg.dim)).astype(jnp.float32),
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {
            "scale": jnp.ones((cfg.dim,), jnp.float32),
            "bias": jnp.zeros((cfg.dim,), jnp.float32),
        }
    if cfg.model_type == "i2v" and not geoada:
        p["cross_attn"]["k_img"] = _init_linear(ks[5], cfg.dim, cfg.dim, dtype)
        p["cross_attn"]["v_img"] = _init_linear(
            jax.random.fold_in(ks[5], 1), cfg.dim, cfg.dim, dtype)
        p["cross_attn"]["norm_k_img"] = {"scale": jnp.ones((cfg.dim,), jnp.float32)}
    if geoada:
        # zero-init skip projections (wan_transformer3d_versecrafter.py:104-110)
        p["after_proj"] = _init_linear(ks[5], cfg.dim, cfg.dim, dtype, zero=True)
        if geoada_first:
            p["before_proj"] = _init_linear(
                jax.random.fold_in(ks[5], 2), cfg.dim, cfg.dim, dtype, zero=True)
    return p


def init_wan_dit(key: jax.Array, cfg: WanDiTConfig,
                 dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 10)
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_dim * pt * ph * pw

    params: Params = {
        "patch_embedding": _init_linear(ks[0], patch_in, cfg.dim, dtype),
        "text_embedding": {
            "fc1": _init_linear(ks[1], cfg.text_dim, cfg.dim, dtype, init="normal02"),
            "fc2": _init_linear(ks[2], cfg.dim, cfg.dim, dtype, init="normal02"),
        },
        "time_embedding": {
            "fc1": _init_linear(ks[3], cfg.freq_dim, cfg.dim, jnp.float32, init="normal02"),
            "fc2": _init_linear(ks[4], cfg.dim, cfg.dim, jnp.float32, init="normal02"),
        },
        "time_projection": _init_linear(ks[5], cfg.dim, cfg.dim * 6, jnp.float32),
        "head": {
            "head": _init_linear(ks[6], cfg.dim, math.prod(cfg.patch_size) * cfg.out_dim,
                                 dtype, zero=True),
            "modulation": (jax.random.normal(ks[7], (2, cfg.dim)) / math.sqrt(cfg.dim)).astype(jnp.float32),
        },
    }

    blk_keys = jax.random.split(ks[8], cfg.num_layers)
    blocks = [_init_block(k, cfg, dtype) for k in blk_keys]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if cfg.has_geoadapter:
        glayers = cfg.resolved_geoada_layers
        gkeys = jax.random.split(ks[9], len(glayers) + 1)
        gblocks = [
            _init_block(k, cfg, dtype, geoada=True, geoada_first=(i == 0))
            for i, k in enumerate(gkeys[:-1])
        ]
        # before_proj exists only on block 0; stack the rest, keep block 0's
        # extra leaf separate so the pytree stacks cleanly.
        before_proj = gblocks[0].pop("before_proj")
        params["geoada_blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *gblocks)
        params["geoada_before_proj"] = before_proj
        g_patch_in = cfg.resolved_geoada_in_dim * pt * ph * pw
        params["geoada_patch_embedding"] = _init_linear(
            jax.random.fold_in(ks[9], 7), g_patch_in, cfg.dim, dtype)

    if cfg.add_control_adapter:
        params["control_adapter"] = init_simple_adapter(
            jax.random.fold_in(key, 77), cfg, dtype)

    if cfg.model_type == "i2v" and cfg.add_img_emb:
        ik = jax.random.split(jax.random.fold_in(key, 99), 2)
        params["img_emb"] = {
            "norm_in": {"scale": jnp.ones((cfg.img_emb_dim,), jnp.float32),
                        "bias": jnp.zeros((cfg.img_emb_dim,), jnp.float32)},
            "fc1": _init_linear(ik[0], cfg.img_emb_dim, cfg.img_emb_dim, dtype),
            "fc2": _init_linear(ik[1], cfg.img_emb_dim, cfg.dim, dtype),
            "norm_out": {"scale": jnp.ones((cfg.dim,), jnp.float32),
                         "bias": jnp.zeros((cfg.dim,), jnp.float32)},
        }
    return params


def _alloc_stack(blk: Params, n: int) -> Params:
    """Preallocate an n-layer stack matching one (possibly quantized)
    block's tree. Zero-size leaves (quantize's `qdtype` tokens) are
    per-TREE markers, not per-layer data — kept unstacked so the result
    matches `quantize_tree` applied to an eagerly stacked tree."""
    return jax.tree.map(
        lambda a: a if a.size == 0 else jnp.zeros((n, *a.shape), a.dtype),
        blk)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_stack(stacked: Params, blk: Params, i) -> Params:
    return jax.tree.map(
        lambda s, b: s if b.size == 0
        else jax.lax.dynamic_update_index_in_dim(s, b, i, 0),
        stacked, blk)


def init_wan_dit_quantized(key: jax.Array, cfg: WanDiTConfig,
                           dtype=jnp.bfloat16, bits: int = 8,
                           int8_compute: bool = False,
                           act_scales=None) -> Params:
    """Build a DiT DIRECTLY in quantized form on device.

    Blocks (base and GeoAdapter) initialize ONE AT A TIME (bf16 transient
    ~0.7 GB at 14B scale), quantize on device, and write into preallocated
    stacks with donated buffers — peak HBM stays ~quantized weights + one
    bf16 block. This is the single-chip 14B residency strategy: the eager
    `quantize_tree(init_wan_dit(...))` would transiently materialize the
    full bf16 tree (~28 GB at 14B, ~42 GB with the GeoAdapter) and OOM a
    16 GB v5e. The reference's analogue is fp8 weight conversion
    (convert_model_weight_to_float8, versecrafter_inference.py:288-301).

    Key schedule matches init_wan_dit exactly, so at small scale
    `init_wan_dit_quantized(k, cfg) == quantize_tree(init_wan_dit(k, cfg))`
    leaf for leaf (tests/test_staged.py asserts this).
    """
    from versecrafter_tpu.utils.quantize import quantize_tree, tag_int8_compute

    gs = 0 if (bits == 4 and int8_compute) else None
    quant_one = jax.jit(lambda p: quantize_tree(p, bits=bits, group_size=gs))

    def build_stack(keys, geoada: bool):
        init_one = jax.jit(
            lambda k: _init_block(k, cfg, dtype, geoada=geoada))
        init_first = jax.jit(
            lambda k: _init_block(k, cfg, dtype, geoada=geoada,
                                  geoada_first=True))
        stacked = None
        for i, k in enumerate(keys):
            blk = (init_first if (geoada and i == 0) else init_one)(k)
            if geoada and i == 0:
                blk.pop("before_proj")  # zero-init; rebuilt in `small` below
            blk = quant_one(blk)
            if stacked is None:
                stacked = _alloc_stack(blk, len(keys))
            stacked = _write_stack(stacked, blk, i)
        return stacked

    ks = jax.random.split(key, 10)
    blocks = build_stack(jax.random.split(ks[8], cfg.num_layers), False)
    gblocks = None
    if cfg.has_geoadapter:
        glayers = cfg.resolved_geoada_layers
        gkeys = jax.random.split(ks[9], len(glayers) + 1)
        gblocks = build_stack(gkeys[:-1], True)

    # small non-block params via init_wan_dit at num_layers=1 — the key
    # schedule is layer-count independent (ks = split(key, 10) up front),
    # and the only key-dependent geoada leaf outside the stacks
    # (geoada_before_proj) is zero-init, so its value is key-independent
    def small(k):
        scfg = dataclasses.replace(cfg, num_layers=1)
        if cfg.has_geoadapter:
            scfg = dataclasses.replace(scfg, geoada_layers=(0,))
        p = init_wan_dit(k, scfg, dtype)
        p.pop("blocks")
        p.pop("geoada_blocks", None)
        return quantize_tree(p, bits=bits, group_size=gs)

    params = jax.jit(small)(key)
    params["blocks"] = blocks
    if gblocks is not None:
        params["geoada_blocks"] = gblocks
    if int8_compute:
        params = tag_int8_compute(params, act_scales)
    return params


# ---------------------------------------------------------------------------
# attention / block forward
# ---------------------------------------------------------------------------

def _self_attention(p: Params, x: jnp.ndarray, cos, sin, num_heads: int,
                    qk_norm: bool, eps: float, attn_impl: str,
                    window_size: tuple = (-1, -1),
                    rope_i=None, fuse_qk: bool = True,
                    calib: Optional[dict] = None) -> jnp.ndarray:
    b, s, d = x.shape
    n = num_heads
    hd = d // n
    if calib is not None:
        calib["self_attn/q/kernel"] = _amax(x)
        calib["self_attn/k/kernel"] = calib["self_attn/q/kernel"]
        calib["self_attn/v/kernel"] = calib["self_attn/q/kernel"]
    fused_path = attn_impl != "sp" and fuse_qk
    rstats = None
    if (fused_path and qk_norm and PROJ_STAT_FUSION
            and not isinstance(p["q"]["kernel"], dict)
            and not isinstance(p["k"]["kernel"], dict)):
        # q/k projections emit their own row-RMS statistics in the matmul
        # epilogue — no standalone [B,S,D] reduce passes
        q, rq = linear_rstat(p["q"], x, eps)
        k, rk = linear_rstat(p["k"], x, eps)
        rstats = (rq, rk)
    else:
        q = _linear(p["q"], x)
        k = _linear(p["k"], x)
    v = _linear(p["v"], x)
    if fused_path:
        # norm + rope fused into the attention kernel (no separate
        # fp32-bandwidth passes; unfused reference math on non-pallas
        # backends — see kernels.flash_attention.fused_rope_rms_attention)
        out = fused_rope_rms_attention(
            q, k, v, cos, sin,
            p["norm_q"]["scale"] if qk_norm else None,
            p["norm_k"]["scale"] if qk_norm else None,
            num_heads=n, eps=eps, window_size=window_size, impl=attn_impl,
            tables_i=rope_i, rstats=rstats, int8_score=INT8_QK_SCORE)
        if calib is not None:
            calib["self_attn/o/kernel"] = _amax(out)
        return _linear(p["o"], out)
    # sequence-parallel path (rope needs the LOCAL table slice before the
    # all_to_all redistributes heads/sequence) and the fuse_qk=False
    # fallback keep the separate passes
    if qk_norm:
        q = rms_norm(q, p["norm_q"]["scale"], eps)
        k = rms_norm(k, p["norm_k"]["scale"], eps)
    q = apply_rope(q.reshape(b, s, n, hd), cos, sin)
    k = apply_rope(k.reshape(b, s, n, hd), cos, sin)
    v = v.reshape(b, s, n, hd)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    if attn_impl == "sp":
        from versecrafter_tpu.parallel.sharding import (
            sequence_parallel_attention)
        out = sequence_parallel_attention(q, k, v, window_size=window_size)
    else:
        out = flash_attention(q, k, v, impl=attn_impl,
                              window_size=window_size)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    if calib is not None:
        calib["self_attn/o/kernel"] = _amax(out)
    return _linear(p["o"], out)


def _cross_attention(p: Params, x: jnp.ndarray, context: jnp.ndarray,
                     num_heads: int, qk_norm: bool, eps: float,
                     attn_impl: str,
                     context_img: Optional[jnp.ndarray] = None,
                     fuse_qk: bool = False,
                     calib: Optional[dict] = None) -> jnp.ndarray:
    b, s, d = x.shape
    n = num_heads
    hd = d // n
    if calib is not None:
        calib["cross_attn/q/kernel"] = _amax(x)
        calib["cross_attn/k/kernel"] = _amax(context)
        calib["cross_attn/v/kernel"] = calib["cross_attn/k/kernel"]
    fused_path = attn_impl != "sp" and fuse_qk and context_img is None
    rq = None
    if (fused_path and qk_norm and PROJ_STAT_FUSION
            and not isinstance(p["q"]["kernel"], dict)):
        # q projection emits its own row-RMS statistic in the matmul
        # epilogue (the k statistic spans only the 512 context tokens)
        q, rq = linear_rstat(p["q"], x, eps)
    else:
        q = _linear(p["q"], x)
    k = _linear(p["k"], context)
    v = _linear(p["v"], context)
    if fused_path:
        # norm fused into the kernel; removes the q-RMS pass over the long
        # video axis and the [B,S,D]<->[B,N,S,D] relayouts (the i2v img-KV
        # branch keeps the separate-passes path below)
        out = fused_rms_cross_attention(
            q, k, v,
            p["norm_q"]["scale"] if qk_norm else None,
            p["norm_k"]["scale"] if qk_norm else None,
            num_heads=n, eps=eps, impl=attn_impl, rq=rq)
        if calib is not None:
            calib["cross_attn/o/kernel"] = _amax(out)
        return _linear(p["o"], out)
    if qk_norm:
        q = rms_norm(q, p["norm_q"]["scale"], eps)
        k = rms_norm(k, p["norm_k"]["scale"], eps)
    q = q.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    if attn_impl == "sp":
        from versecrafter_tpu.parallel.sharding import sp_cross_attention
        _xattn = sp_cross_attention
    else:
        _xattn = functools.partial(flash_attention, impl=attn_impl)
    out = _xattn(q, k, v)
    if context_img is not None:
        # i2v: separate K/V over the 257 CLIP tokens, added to the text path
        # (WanI2VCrossAttention, wan_transformer3d.py:439-493)
        if calib is not None:
            calib["cross_attn/k_img/kernel"] = _amax(context_img)
            calib["cross_attn/v_img/kernel"] = calib["cross_attn/k_img/kernel"]
        k_img = _linear(p["k_img"], context_img)
        if qk_norm:
            k_img = rms_norm(k_img, p["norm_k_img"]["scale"], eps)
        v_img = _linear(p["v_img"], context_img)
        k_img = k_img.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
        v_img = v_img.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
        out = out + _xattn(q, k_img, v_img)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    if calib is not None:
        calib["cross_attn/o/kernel"] = _amax(out)
    return _linear(p["o"], out)


def wan_block_forward(p: Params, cfg: WanDiTConfig, x: jnp.ndarray,
                      e0: jnp.ndarray, cos, sin, context: jnp.ndarray,
                      attn_impl: str = "auto",
                      context_img: Optional[jnp.ndarray] = None,
                      rope_i=None, fuse_qk: bool = True,
                      calib: Optional[dict] = None) -> jnp.ndarray:
    """One WanAttentionBlock (wan_transformer3d.py:564-611).

    x: [B, S, D] (bf16); e0: [B, 6, D] fp32 time modulation.
    calib: when a dict, per-tensor activation absmaxes are recorded into it
    (keys = utils.quantize.COMPUTE_SITES suffixes) for static W8A8
    calibration — incompatible with remat (recorded tracers would escape
    jax.checkpoint).
    """
    dtype = x.dtype
    e = (p["modulation"][None].astype(jnp.float32) + e0)  # [B, 6, D]

    tmp = layer_norm(x, eps=cfg.eps).astype(jnp.float32)
    tmp = (tmp * (1.0 + e[:, 1][:, None]) + e[:, 0][:, None]).astype(dtype)
    y = _self_attention(p["self_attn"], tmp, cos, sin, cfg.num_heads,
                        cfg.qk_norm, cfg.eps, attn_impl,
                        window_size=cfg.window_size, rope_i=rope_i,
                        fuse_qk=fuse_qk, calib=calib)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[:, 2][:, None]).astype(dtype)

    if cfg.cross_attn_norm:
        xn = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"], eps=cfg.eps)
    else:
        xn = x
    # cross fusion is gated independently of the self-attn fuse_qk flag:
    # the geoada anomaly (see GEOADA_FUSED_QK) is specific to the rope-table
    # kernel, so geoada programs can still take the norm-only cross kernel
    x = x + _cross_attention(p["cross_attn"], xn, context, cfg.num_heads,
                             cfg.qk_norm, cfg.eps, attn_impl,
                             context_img=context_img,
                             fuse_qk=FUSED_CROSS_ATTENTION, calib=calib)

    tmp = layer_norm(x, eps=cfg.eps).astype(jnp.float32)
    tmp = (tmp * (1.0 + e[:, 4][:, None]) + e[:, 3][:, None]).astype(dtype)
    if calib is None and tmp.shape[0] * tmp.shape[1] > FFN_CHUNK_ROWS:
        y = _ffn_chunked(p, tmp)
    else:
        h = _gelu_tanh(_linear(p["ffn_in"], tmp))
        if calib is not None:
            calib["ffn_in/kernel"] = _amax(tmp)
            calib["ffn_out/kernel"] = _amax(h)
        y = _linear(p["ffn_out"], h)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[:, 5][:, None]).astype(dtype)
    return x


# ---------------------------------------------------------------------------
# model forward: embed -> blocks -> head
# ---------------------------------------------------------------------------

def simple_adapter(p: Params, y_camera: jnp.ndarray,
                   patch_size=(2, 2), downscale: int = 8) -> jnp.ndarray:
    """Camera-pose control adapter (the base Wan capability the reference
    imports as videox_fun SimpleAdapter, wan_transformer3d.py:36,800-804;
    output added to the patch embeddings at :975-977): per-frame
    pixel-unshuffle by `downscale` into channels, a strided conv
    (kernel=stride=patch -> matmul, pure MXU), then ReLU-conv3x3 residual
    blocks on the per-frame token grid. y_camera: [B, C, F, H, W] ->
    [B, S, D] tokens ordered like patchify's (f, h, w) flattening."""
    b, c, f, h, w = y_camera.shape
    d = downscale
    ph, pw = patch_size
    x = y_camera.reshape(b, c, f, h // d, d, w // d, d)
    x = x.transpose(0, 1, 4, 6, 2, 3, 5).reshape(b, c * d * d, f, h // d, w // d)
    tok = _linear(p["conv"], patchify(x, (1, ph, pw)))  # [B, S, D]
    gh, gw = h // d // ph, w // d // pw
    if p.get("res"):
        # residual blocks run per-frame on the [gh, gw] token grid in NHWC
        z = tok.reshape(b * f, gh, gw, tok.shape[-1])
        for blk in p["res"]:
            y = z
            for cv in (blk["conv1"], blk["conv2"]):
                y = jax.nn.relu(y)
                y = jax.lax.conv_general_dilated(
                    y, cv["kernel"].astype(y.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = y + cv["bias"].astype(y.dtype)
            z = z + y
        tok = z.reshape(b, f * gh * gw, tok.shape[-1])
    return tok


def init_simple_adapter(key, cfg: WanDiTConfig, dtype) -> Params:
    d = cfg.downscale_factor_control_adapter
    ph, pw = cfg.patch_size[1:]
    ks = jax.random.split(key, 1 + 2 * cfg.control_adapter_residual_blocks)
    p: Params = {"conv": _init_linear(
        ks[0], cfg.in_dim_control_adapter * d * d * ph * pw, cfg.dim, dtype)}
    res = []
    for i in range(cfg.control_adapter_residual_blocks):
        def conv3(k):
            lim = math.sqrt(6.0 / (2 * 9 * cfg.dim))
            return {"kernel": jax.random.uniform(
                        k, (3, 3, cfg.dim, cfg.dim),
                        minval=-lim, maxval=lim).astype(dtype),
                    "bias": jnp.zeros((cfg.dim,), dtype)}
        res.append({"conv1": conv3(ks[1 + 2 * i]), "conv2": conv3(ks[2 + 2 * i])})
    p["res"] = res
    return p


def wan_dit_embed(params: Params, cfg: WanDiTConfig, x: jnp.ndarray,
                  t: jnp.ndarray, context: jnp.ndarray,
                  clip_fea: Optional[jnp.ndarray] = None,
                  y_camera: Optional[jnp.ndarray] = None):
    """Patch-embed video latents + time / text embeddings.

    x: [B, C_in, F, H, W]; t: [B] timesteps; context: [B, text_len, text_dim];
    y_camera: optional [B, C_cam, F*pt, H_lat*ds, W_lat*ds] camera-pose
    control maps routed through the SimpleAdapter and added to the patch
    embeddings (wan_transformer3d.py:975-977).
    Returns (tokens [B,S,D], e [B,D] fp32, e0 [B,6,D] fp32,
    ctx [B,text_len,D], ctx_img or None, grid).
    """
    b = x.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw)

    tokens = _linear(params["patch_embedding"], patchify(x, cfg.patch_size))
    if y_camera is not None:
        if "control_adapter" not in params:
            raise ValueError(
                "y_camera conditioning passed but params have no "
                "'control_adapter' entry — the checkpoint was built without "
                "a SimpleAdapter (add_control_adapter=False), so the maps "
                "would be silently ignored")
        tokens = tokens + simple_adapter(
            params["control_adapter"], y_camera, cfg.patch_size[1:],
            cfg.downscale_factor_control_adapter).astype(tokens.dtype)

    # time embeddings in fp32 (reference autocast at wan_transformer3d.py:1014)
    te = params["time_embedding"]
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = _linear(te["fc2"], jax.nn.silu(_linear(te["fc1"], e).astype(jnp.float32)))
    e = e.astype(jnp.float32)
    e0 = _linear(params["time_projection"], jax.nn.silu(e)).reshape(b, 6, cfg.dim)
    e0 = e0.astype(jnp.float32)

    tee = params["text_embedding"]
    ctx = _linear(tee["fc2"], _gelu_tanh(_linear(tee["fc1"], context.astype(tokens.dtype))))

    ctx_img = None
    if clip_fea is not None and "img_emb" in params:
        ie = params["img_emb"]
        h = layer_norm(clip_fea, ie["norm_in"]["scale"], ie["norm_in"]["bias"])
        h = _linear(ie["fc2"], jax.nn.gelu(_linear(ie["fc1"], h.astype(tokens.dtype)), approximate=False))
        ctx_img = layer_norm(h, ie["norm_out"]["scale"], ie["norm_out"]["bias"]).astype(tokens.dtype)

    return tokens, e, e0, ctx, ctx_img, grid


def wan_dit_e0(params: Params, cfg: WanDiTConfig, t: jnp.ndarray) -> jnp.ndarray:
    """The [B, 6, D] fp32 time-modulation vector — exactly the `e0`
    wan_dit_embed computes, extracted because it depends ONLY on the
    timestep and the time-embedding weights. The host-gated TeaCache path
    (sampling/teacache.host_gate) evaluates the skip metric from this tiny
    program before dispatching a step, instead of tracing both the fresh
    and cached paths into one lax.cond program (which at 75,600 tokens
    cost ~1.6 GB of dual-path temps + fragmentation on the 14B 720p step)."""
    from versecrafter_tpu.utils.quantize import dequantize_tree
    te = dequantize_tree(params["time_embedding"])
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = _linear(te["fc2"], jax.nn.silu(_linear(te["fc1"], e).astype(jnp.float32)))
    e = e.astype(jnp.float32)
    e0 = _linear(dequantize_tree(params["time_projection"]), jax.nn.silu(e))
    return e0.reshape(t.shape[0], 6, cfg.dim).astype(jnp.float32)


def wan_dit_blocks(params: Params, cfg: WanDiTConfig, x: jnp.ndarray,
                   e0: jnp.ndarray, cos, sin, context: jnp.ndarray,
                   geoada_tokens: Optional[jnp.ndarray] = None,
                   geoada_scale: float = 1.0,
                   attn_impl: str = "auto",
                   context_img: Optional[jnp.ndarray] = None,
                   remat: bool = False,
                   calibrate: bool = False):
    """Run all transformer blocks (the TeaCache-skippable section).

    Without a GeoAdapter: lax.scan over `num_layers` stacked blocks.
    With one: scan over supersteps interleaving geoada block i before base
    blocks [g*i .. g*(i+1)) where g = layer stride — numerics identical to
    the reference's compute-all-hints-first order because the geoada chain
    only depends on the *initial* tokens (wan_transformer3d_versecrafter.py:
    254-292, 379).

    calibrate=True additionally returns per-layer activation absmax stats
    ({"blocks": {site: [L]}, "geoada_blocks": {site: [G]}} — feed to
    utils.quantize.fit_act_scales for static W8A8 scales).
    """
    L = cfg.num_layers
    if calibrate and remat:
        raise ValueError("calibrate is inference-only (stats escape remat)")

    # gradient checkpointing: rematerialize each block in the backward pass
    # (the TPU replacement for the reference's torch.utils.checkpoint +
    # save_on_cpu at wan_transformer3d.py:270-304)
    blk = wan_block_forward
    if remat:
        # cfg (1), attn_impl (7) and fuse_qk (10) are non-array statics
        blk = jax.checkpoint(wan_block_forward, static_argnums=(1, 7, 10))

    # int8 weight storage: dequantize PER LAYER inside the scan body — a
    # whole-tree dequant before the scan would materialize the full bf16
    # weights (2x14B = 28 GB at flagship scale); this keeps one transient
    # bf16 block (~0.7 GB) alive at a time while HBM holds int8
    from versecrafter_tpu.utils.quantize import (
        dequantize_tree, has_quantized, strip_dtype_tokens)
    block_params = params["blocks"]
    if has_quantized(block_params):
        block_params = strip_dtype_tokens(block_params)
    # identity on unquantized leaves, so one deq serves every subtree —
    # including a quantized geoada tree next to unquantized base blocks
    # (adapter-only quantization) or vice versa
    deq = functools.partial(dequantize_tree, dtype=x.dtype)

    # interleaved/padded rope tables for the fused attention kernel, built
    # ONCE per forward instead of inside every scanned layer (unused and
    # DCE'd on the unfused/xla/sp paths)
    rope_i = None
    if attn_impl != "sp":
        from versecrafter_tpu.kernels.flash_attention import (
            prepare_fused_rope_tables)
        rope_i = prepare_fused_rope_tables(cos, sin,
                                           window=cfg.window_size)

    # plain models fuse EXCEPT where the dispatch would need blocked rope
    # tables (~720p, 75,600 tok): there the resident mode measured +699 ms
    # vs unfused for plain programs while still winning -568 ms for geoada
    # (bench_fused_ablation --res 720, chip) — so the two gates differ.
    plain_fuse = FUSED_QK_ATTENTION and (
        PLAIN_FUSED_AT_BLOCKED
        or not fused_tables_blocked(x.shape[1], cfg.head_dim,
                                    cfg.window_size))

    if not cfg.has_geoadapter or geoada_tokens is None:
        def body(carry, bp):
            cal = {} if calibrate else None
            out = blk(deq(bp), cfg, carry, e0, cos, sin, context,
                      attn_impl, context_img, rope_i,
                      plain_fuse, cal)
            return out, cal
        x, stats = jax.lax.scan(body, x, block_params)
        return (x, {"blocks": stats}) if calibrate else x

    # geoada programs fuse self-attention only where the kernel dispatch
    # will run its resident-KV flavor (see the FUSED_QK_ATTENTION note):
    # the streaming flavor measured +70-110 ms/step in geoada programs,
    # the resident one -419 ms.
    geo_fuse = FUSED_QK_ATTENTION and (
        GEOADA_FUSED_QK
        or resident_kv_available(x.shape[1], cfg.head_dim, cfg.window_size))

    glayers = cfg.resolved_geoada_layers
    stride = glayers[1] - glayers[0] if len(glayers) > 1 else L
    uniform = (
        glayers == tuple(range(0, L, stride)) and L % stride == 0
        and len(glayers) == L // stride
    )
    if not uniform:
        raise NotImplementedError(
            f"non-uniform geoada_layers {glayers} (reference default is every "
            f"2nd layer; add a python-loop path if ever needed)")

    geo_params = params["geoada_blocks"]
    if has_quantized(geo_params):
        geo_params = strip_dtype_tokens(geo_params)
    c = _linear(deq(params["geoada_before_proj"]), geoada_tokens) + x

    if remat or not GEOADA_STACKED_HINTS:
        # TRAINING (and the inference default): interleave geoada block i
        # right before base block
        # stride*i so only ONE hint is alive at a time (O(1) activation
        # memory under remat) — identical numerics to the reference's
        # compute-all-hints-first order because the hint chain depends only
        # on the initial tokens (wan_transformer3d_versecrafter.py:254-292).
        base_stacked = jax.tree.map(
            lambda a: a.reshape(len(glayers), stride, *a.shape[1:]),
            block_params)

        def superstep(carry, layer_params):
            xx, cc = carry
            gp, bps = layer_params
            gp = deq(gp)
            gcal = {} if calibrate else None
            cc = blk(gp, cfg, cc, e0, cos, sin, context, attn_impl, None,
                     rope_i, geo_fuse, gcal)
            bcals = []
            for j in range(stride):
                bp = deq(jax.tree.map(lambda a: a[j], bps))
                bcal = {} if calibrate else None
                xx = blk(bp, cfg, xx, e0, cos, sin, context,
                         attn_impl, context_img, rope_i,
                         geo_fuse, bcal)
                bcals.append(bcal)
                if j == 0:
                    # the hint projection runs HERE, at its only use, not up
                    # by the geoada block: computed early it is a [B, S, D]
                    # buffer XLA keeps live across base block 0's whole
                    # forward — 738 MB of the 720p 14B step's OOM margin
                    hint = _linear(gp["after_proj"], cc)
                    xx = xx + (hint * jnp.asarray(geoada_scale, hint.dtype)
                               ).astype(xx.dtype)
            stats = None
            if calibrate:
                stats = {"geoada_blocks": gcal,
                         "blocks": jax.tree.map(
                             lambda *a: jnp.stack(a), *bcals)}
            return (xx, cc), stats

        (x, _), stats = jax.lax.scan(superstep, (x, c),
                                     (geo_params, base_stacked))
        if calibrate:
            # blocks stats come out [G, stride] -> flatten to [L]
            return x, {"blocks": jax.tree.map(
                lambda a: a.reshape(L, *a.shape[2:]), stats["blocks"]),
                "geoada_blocks": stats["geoada_blocks"]}
        return x

    # INFERENCE: the reference's order — all hints first, then the base
    # stack — as TWO PLAIN single-block scans. Measured on the v5e: the
    # pair-unrolled tuple-carry superstep above defeats the fused attention
    # kernel's win (+101 ms/step vs -200 in a plain scan; round-3 probes),
    # while plain scans keep it. Costs len(glayers) stacked hints
    # (~1.5 GB bf16 at 1.3B/32k tokens; sp-sharded under a mesh) — fine for
    # inference, which doesn't hold optimizer/grad state.
    if calibrate:
        raise NotImplementedError(
            "calibrate uses the interleaved-superstep schedule "
            "(GEOADA_STACKED_HINTS=False) — identical numerics")

    def hint_step(cc, gp):
        gp = deq(gp)
        cc = blk(gp, cfg, cc, e0, cos, sin, context, attn_impl, None,
                 rope_i, geo_fuse)
        return cc, _linear(gp["after_proj"], cc)

    _, hints = jax.lax.scan(hint_step, c, geo_params)  # [G, B, S, D]
    gscale = jnp.asarray(geoada_scale, hints.dtype)

    def base_step(carry, xs):
        bp, layer_idx = xs
        xx = blk(deq(bp), cfg, carry, e0, cos, sin, context,
                 attn_impl, context_img, rope_i,
                 geo_fuse)
        # hint after every `stride`-th block (reference adds hints[idx]
        # right after block i for i in geoada_layers)
        is_hinted = layer_idx % stride == 0
        hint = jax.lax.dynamic_index_in_dim(
            hints, layer_idx // stride, axis=0, keepdims=False)
        xx = jnp.where(is_hinted,
                       xx + (hint * gscale).astype(xx.dtype), xx)
        return xx, None

    x, _ = jax.lax.scan(
        base_step, x, (block_params, jnp.arange(L, dtype=jnp.int32)))
    return x


def wan_dit_head(params: Params, cfg: WanDiTConfig, x: jnp.ndarray,
                 e: jnp.ndarray, grid) -> jnp.ndarray:
    """Final AdaLN head + unpatchify (Head, wan_transformer3d.py:614-644)."""
    hp = params["head"]
    em = hp["modulation"][None].astype(jnp.float32) + e[:, None].astype(jnp.float32)
    xn = layer_norm(x, eps=cfg.eps).astype(jnp.float32)
    xn = (xn * (1.0 + em[:, 1][:, None]) + em[:, 0][:, None]).astype(x.dtype)
    out = _linear(hp["head"], xn)
    return unpatchify(out, grid, cfg.patch_size, cfg.out_dim)


def wan_dit_forward(
    params: Params,
    cfg: WanDiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    geoada_context: Optional[jnp.ndarray] = None,
    geoada_scale: float = 1.0,
    y: Optional[jnp.ndarray] = None,
    clip_fea: Optional[jnp.ndarray] = None,
    y_camera: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    calibrate: bool = False,
):
    """Full denoiser forward.

    x: [B, C_in, F_lat, H_lat, W_lat] noisy latents
    t: [B] flow-matching timesteps (0..num_train_timesteps)
    context: [B, text_len, text_dim] padded T5 embeddings
    cos/sin: RoPE tables for this grid ([S, head_dim/2], from kernels.rope)
    geoada_context: [B, geoada_in_dim, F_lat, H_lat, W_lat] control latents
    y: [B, C_y, F, H, W] conditioning latents concatenated on channels (i2v,
       wan_transformer3d.py:969-970)
    y_camera: camera-pose control maps for the SimpleAdapter (see
       wan_dit_embed)
    Returns [B, C_out, F_lat, H_lat, W_lat] velocity prediction; with
    calibrate=True returns (prediction, activation-absmax stats) for
    static W8A8 calibration (utils.quantize.fit_act_scales).
    """
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)
    tokens, e, e0, ctx, ctx_img, grid = wan_dit_embed(
        params, cfg, x, t, context, clip_fea, y_camera=y_camera)

    if attn_impl == "sp":
        from versecrafter_tpu.parallel.sharding import constrain_tokens
        tokens = constrain_tokens(tokens)

    gtokens = None
    if geoada_context is not None and cfg.has_geoadapter:
        gtokens = _linear(params["geoada_patch_embedding"],
                          patchify(geoada_context, cfg.patch_size))
        if attn_impl == "sp":
            gtokens = constrain_tokens(gtokens)

    tokens = wan_dit_blocks(params, cfg, tokens, e0, cos, sin, ctx,
                            geoada_tokens=gtokens, geoada_scale=geoada_scale,
                            attn_impl=attn_impl, context_img=ctx_img,
                            calibrate=calibrate)
    if calibrate:
        tokens, stats = tokens
        return wan_dit_head(params, cfg, tokens, e, grid), stats
    return wan_dit_head(params, cfg, tokens, e, grid)
