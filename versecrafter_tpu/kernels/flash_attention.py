"""Pallas TPU flash attention with variable KV-length masking.

TPU-native replacement for the reference's flash-attn-2 dispatch
(videox_fun.models.attention_utils.attention, consumed at
/root/reference/versecrafter/models/wan_transformer3d.py:394-399,425-430 with
`k_lens` masking). Design per the TPU kernel playbook: blockwise online
softmax, fp32 statistics, grid (batch, heads, q_blocks, kv_blocks) with the
KV dimension as the sequential reduction, and per-batch `k_lens` delivered
via scalar prefetch so fully-masked KV tiles are skipped before any matmul.

Layout is head-major [B, N, S, D]: the S×D tiles are MXU-shaped (D=128 for
Wan) and the head axis is a pure parallel grid dimension, which also makes
`tp` sharding of heads a no-op for the kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = math.log2(math.e)

# int8 QK^T scoring: per-ROW k scales (finest granularity; needs a
# [rows,1]->[1,rows] relayout at K-rotate time) vs one per-TILE scalar
# (SageAttention granularity, relayout-free). Emergency knob read at trace
# time — flip to False and restart if the relayout misbehaves under Mosaic.
INT8_KSCALE_PER_ROW = True


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_q(sq: int) -> int:
    """Large q blocks amortize the m/l/acc bookkeeping across more MXU work
    (measured on v5e: bq~4-5k at bkv=1024 runs ~152-167 TF/s vs ~128 at the
    round-1 1024/1024 default — scripts/bench_kernel_variants.py). Prefer a
    divisor of the sequence so no padded q rows are computed at all
    (32,760 -> 4,680; 75,600 -> 5,400), bounded at 5,456 so the fp32 score
    tile + vreg spills stay inside scoped VMEM. The resident-KV fused mode
    does NOT route through this cap — its q block comes from
    RESIDENT_BLOCK_Q_CANDIDATES in _fused_block_geometry (flat aligned
    blocks measured faster than pad-free divisors there). When no divisor
    exists (e.g. ring shards: 75,600/8 = 9,450), pick the block that
    balances the q rows over ceil(sq/4096) blocks instead of a flat 4096
    (which would compute up to ~30-50% padded rows)."""
    if sq <= 4096:
        return _ceil_to(sq, 128)
    for d in range(min(sq, 5456), 3583, -8):
        if sq % d == 0:
            return d
    nblocks = -(-sq // 4096)
    return _ceil_to(-(-sq // nblocks), 128)


def _pairswap(x, interpret: bool):
    """Swap adjacent lanes: out[..., 2i] = x[..., 2i+1], out[..., 2i+1] =
    x[..., 2i] — the lane shuffle that turns the interleaved-table RoPE
    rotation into two fused multiply-adds (see interleave_rope_tables)."""
    if interpret:
        up = jnp.roll(x, -1, axis=-1)
        dn = jnp.roll(x, 1, axis=-1)
    else:
        # pltpu.roll requires a non-negative shift; roll(-1) == roll(L-1)
        up = pltpu.roll(x, x.shape[-1] - 1, axis=x.ndim - 1)
        dn = pltpu.roll(x, 1, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane % 2 == 0, up, dn)


def _qk_transform(x, rstat, g, cos, sin, interpret: bool):
    """In-tile qk-RMSNorm + RoPE: x [rows, D] bf16 raw projection output,
    rstat [rows, 1] fp32 per-row rsqrt(mean over the FULL model dim) with
    any scalar folds (sm_scale*log2e) pre-applied, g [1, D] fp32 per-channel
    norm scale, cos/sin [rows, D] interleaved tables (bf16 — the table
    rounding is below the bf16 output rounding; None = norm only, the
    cross-attention flavor). fp32 math, bf16 out."""
    xf = x.astype(jnp.float32) * rstat * g
    if cos is None:
        return xf.astype(x.dtype)
    rot = xf * cos.astype(jnp.float32) \
        + _pairswap(xf, interpret) * sin.astype(jnp.float32)
    return rot.astype(x.dtype)


def _fa_kernel(klens_ref, q_ref, k_ref, v_ref, *rest, block_q: int,
               block_kv: int, num_kv_blocks: int, window: tuple,
               masked: bool, stats: bool, fused: bool, interpret: bool,
               rope: bool = True, resident_kv: bool = False,
               blocked_tables: bool = False, int8_score: bool = False):
    """sm_scale is pre-folded into q by the caller (one [B,N,S,D] multiply
    instead of a per-tile [bq,bkv] one — every elementwise op on the score
    tile costs real VPU time).

    Statically-selected flavors:
    - stats=False (inference): exp2 scoring (sm_scale*log2e folded into q —
      one fewer VPU op inside the transcendental) and NO m/l outputs: the
      round-1 kernel wrote 2x[B,N,S,128] fp32 stats to HBM that inference
      never read.
    - stats=True (training fwd / ring): natural-log domain, m/l written —
      bit-identical to round 1, because fa_backward and the ring merge
      recompute exp(s - m) with their own sm_scale folding and a different
      bf16 rounding of q*(scale*log2e) would bias the recomputed p.
    - fused=True (inference only, implies stats=False): q/k/v arrive RAW
      from the projections in their NATIVE flat [B, S, N*D] layout — the
      per-head [bq, D] tile is carved out by the LANE-dim block index
      (strided 256-byte-row DMA, far below the DMA bandwidth the matmul
      time affords) — so the model needs no [B,N,S,D] relayout passes at
      all and the output writes back in the o-projection's layout. Per-row
      RMS statistics ([B,S,1], spanning ALL heads — a per-head tile cannot
      compute them), per-head norm-scale slices ([N, 1, D], block-indexed by
      the head grid dim) and interleaved RoPE tables are extra inputs, and
      the norm+rotation run in-tile (VPU work hidden under the MXU) instead
      of as separate HBM-bandwidth passes. The cos/sin tables are FULL-ARRAY
      inputs (constant index map -> fetched into VMEM once per kernel call,
      not re-streamed per KV tile), sliced per tile with pl.ds. The q
      transform is computed once per q block into a scratch; the k transform
      is recomputed per (iq, ikv) visit — negligible VPU time vs the matmul.
    - resident_kv=True (fused rope flavor, unwindowed, VMEM permitting): V's
      per-(b,h) slice is a VMEM resident and K is rotated ONCE into a
      resident scratch during the iq == 0 pass, so K/V are fetched (and K
      transformed) once per (b,h) instead of once per q block — removes the
      (n_q - 1)x redundant strided re-streaming of K/V that makes the flat
      layout's DMA the kernel's weak spot inside large programs.
    - int8_score=True (fused rope flavors, inference): the transformed q/k
      tiles are quantized PER ROW to int8 (q once per q block, k once per
      (b,h) in resident mode — the resident K scratch is then int8, half
      the VMEM) and QK^T runs as an s8 x s8 -> s32 MXU dot (v5e rates int8
      at ~2x bf16); the per-row scales multiply back into the fp32 score
      tile before the softmax. sm_scale*log2e stays folded (it rides the
      q scales). PV stays bf16. SageAttention-style, but with per-row
      rather than per-tile granularity.
    """
    krot_ref = None
    cosq_ref = sinq_ref = cosk_ref = sink_ref = None
    qk8 = ()
    if fused and rope and resident_kv and blocked_tables:
        # tile-mapped tables (long-sequence resident mode): cos/sin arrive
        # as the CURRENT q-row / k-row tile, not the full table
        (qs_ref, ks_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
         gq_ref, gk_ref,
         o_ref, m_ref, l_ref, acc_ref, qrot_ref, krot_ref, *qk8) = rest
        cos_ref = sin_ref = None
    elif fused and rope and resident_kv:
        (qs_ref, ks_ref, cos_ref, sin_ref, gq_ref, gk_ref,
         o_ref, m_ref, l_ref, acc_ref, qrot_ref, krot_ref, *qk8) = rest
    elif fused and rope:
        (qs_ref, ks_ref, cos_ref, sin_ref, gq_ref, gk_ref,
         o_ref, m_ref, l_ref, acc_ref, qrot_ref, *qk8) = rest
    elif fused:  # norm-only (cross-attention): no rope tables at all
        (qs_ref, ks_ref, gq_ref, gk_ref,
         o_ref, m_ref, l_ref, acc_ref, qrot_ref) = rest
        cos_ref = sin_ref = None
    elif stats:
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    # int8 scoring scratches: per-row q scales [bq, LANES], and (resident)
    # per-row k scales in score-column orientation [1, skv_pad]
    qscale_ref = qk8[0] if int8_score else None
    kscale_ref = qk8[1] if (int8_score and resident_kv) else None

    def _quant_rows(t):
        """Transformed tile [rows, D] -> (int8 tile, [rows, 1] f32 scale).
        With INT8_KSCALE_PER_ROW=False the scale is one PER-TILE scalar
        broadcast to the row shape — the emergency knob if Mosaic rejects
        or mis-lowers the [rows,1]->[1,rows] k-scale relayout (coarser
        than per-row, SageAttention's granularity; flip + restart)."""
        tf = t.astype(jnp.float32)
        if INT8_KSCALE_PER_ROW:
            sc = jnp.maximum(jnp.max(jnp.abs(tf), axis=1, keepdims=True),
                             1e-20) / 127.0
        else:
            sc = jnp.broadcast_to(
                jnp.maximum(jnp.max(jnp.abs(tf)), 1e-20) / 127.0,
                (tf.shape[0], 1))
        return jnp.round(tf / sc).astype(jnp.int8), sc

    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    k_len = klens_ref[b]
    wl, wr = window  # static; -1 = unbounded on that side
    exp = jnp.exp if stats else jnp.exp2

    @pl.when(ikv == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if fused:
            if blocked_tables:
                ct, st = cosq_ref[...], sinq_ref[...]
            elif cos_ref is None:
                ct = st = None
            else:
                ct = cos_ref[pl.ds(iq * block_q, block_q), :]
                st = sin_ref[pl.ds(iq * block_q, block_q), :]
            qt = _qk_transform(
                q_ref[0], qs_ref[0], gq_ref[0], ct, st, interpret)
            if int8_score:
                q8, qsc = _quant_rows(qt)
                qrot_ref[...] = q8
                qscale_ref[...] = jnp.broadcast_to(qsc, qscale_ref.shape)
            else:
                qrot_ref[...] = qt

    # Skip KV tiles entirely past this batch element's true KV length, and
    # (for sliding-window attention) tiles fully outside the window of every
    # row in this q block.
    run = ikv * block_kv < k_len
    if wl >= 0:  # tile's last key >= first row's leftmost allowed key
        run = jnp.logical_and(run, ikv * block_kv + block_kv > iq * block_q - wl)
    if wr >= 0:  # tile's first key <= last row's rightmost allowed key
        run = jnp.logical_and(
            run, ikv * block_kv <= iq * block_q + block_q - 1 + wr)

    need_window = wl >= 0 or wr >= 0

    if fused and resident_kv:
        # Transform k ONCE per (b, h): the iq == 0 pass rotates each visited
        # KV tile into the resident scratch; later q blocks reuse it (k_ref's
        # index map only streams fresh tiles while iq == 0). Tiles beyond
        # k_len are never visited at any iq (window is (-1,-1) here — the
        # dispatch falls back to streaming for windowed attention, whose
        # later q blocks need tiles iq == 0 skipped).
        @pl.when(jnp.logical_and(iq == 0, run))
        def _krot():
            kv_slice = pl.ds(ikv * block_kv, block_kv)
            if blocked_tables:
                ct, st = cosk_ref[...], sink_ref[...]
            elif cos_ref is None:
                ct = st = None
            else:
                ct, st = cos_ref[kv_slice, :], sin_ref[kv_slice, :]
            # ks_ref is tile-mapped with k's rotate-once map: ks_ref[0] IS
            # the current kv tile's row stats
            kt = _qk_transform(
                k_ref[0], ks_ref[0], gk_ref[0], ct, st, interpret)
            if int8_score:
                k8, ksc = _quant_rows(kt)
                krot_ref[kv_slice, :] = k8
                kscale_ref[:, kv_slice] = ksc.reshape(1, -1)
            else:
                krot_ref[kv_slice, :] = kt

    def _body(apply_mask: bool):
        kscale_cols = None
        if fused and resident_kv:
            q = qrot_ref[...]
            kv_slice = pl.ds(ikv * block_kv, block_kv)
            k = krot_ref[kv_slice, :]
            if int8_score:
                kscale_cols = kscale_ref[:, kv_slice]  # [1, bkv]
        elif fused:
            q = qrot_ref[...]  # [bq, D] (transformed once at ikv == 0)
            k = _qk_transform(
                k_ref[0], ks_ref[0], gk_ref[0],
                None if cos_ref is None
                else cos_ref[pl.ds(ikv * block_kv, block_kv), :],
                None if sin_ref is None
                else sin_ref[pl.ds(ikv * block_kv, block_kv), :], interpret)
            if int8_score:
                k, ksc = _quant_rows(k)
                kscale_cols = ksc.reshape(1, -1)
        else:
            q = q_ref[0, 0]  # [bq, D]
            k = k_ref[0, 0]  # [bkv, D]
        if int8_score:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            s = s * qscale_ref[:, :1] * kscale_cols
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if apply_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ikv * block_kv
            mask = col < k_len if masked else None
            if need_window:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                    + iq * block_q
                if wl >= 0:
                    wmask = col >= row - wl
                    mask = wmask if mask is None else jnp.logical_and(mask, wmask)
                if wr >= 0:
                    wmask = col <= row + wr
                    mask = wmask if mask is None else jnp.logical_and(mask, wmask)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]                                  # [bq, LANES]
        m_curr = jnp.max(s, axis=1, keepdims=True)           # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)                 # broadcast
        alpha = exp(m_prev[:, :1] - m_next[:, :1])           # [bq, 1]
        p = exp(s - m_next[:, :1])                           # [bq, bkv]

        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next

        if fused and resident_kv:
            v = v_ref[0, pl.ds(ikv * block_kv, block_kv), :]
        else:
            v = v_ref[0] if fused else v_ref[0, 0]  # [bkv, D]
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv

    if masked or need_window:
        # Tiles fully inside k_len AND the window need no mask at all — for
        # padded-but-otherwise-full sequences (480p's 32,760 pads to 32,768)
        # that's every tile but the last, and the compare/where on the score
        # tile is real VPU time.
        full = (ikv + 1) * block_kv <= k_len if masked \
            else jnp.bool_(True)
        if wl >= 0:  # tile's first key >= last row's leftmost allowed key
            full = jnp.logical_and(
                full, ikv * block_kv >= iq * block_q + block_q - 1 - wl)
        if wr >= 0:  # tile's last key <= first row's rightmost allowed key
            full = jnp.logical_and(
                full, ikv * block_kv + block_kv - 1 <= iq * block_q + wr)

        @pl.when(jnp.logical_and(run, full))
        def _run_full():
            _body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
        def _run_masked():
            _body(True)
    else:
        @pl.when(run)
        def _run():
            _body(False)

    @pl.when(ikv == num_kv_blocks - 1)
    def _store():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        if fused:
            o_ref[0] = out
        else:
            o_ref[0, 0] = out
        if stats:
            mo_ref[0, 0] = m_ref[...]
            lo_ref[0, 0] = l_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_kv", "interpret",
                     "return_stats", "window", "masked"),
)
def _flash_attention_pallas(q, k, v, k_lens, *, sm_scale, block_q, block_kv,
                            interpret, return_stats=False, window=(-1, -1),
                            masked=True):
    B, N, Sq, D = q.shape
    Skv = k.shape[2]

    # fold the softmax scale into q once (and log2e with it on the exp2
    # inference path — see _fa_kernel)
    scale = sm_scale if return_stats else sm_scale * LOG2E
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    sq_pad = _ceil_to(Sq, block_q)
    skv_pad = _ceil_to(Skv, block_kv)
    if sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))
        masked = True  # padded keys must not contribute

    num_kv_blocks = skv_pad // block_kv
    grid = (B, N, sq_pad // block_q, num_kv_blocks)

    kernel = functools.partial(
        _fa_kernel, block_q=block_q, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks, window=window, masked=masked,
        stats=return_stats, fused=False, interpret=interpret,
    )

    out_shape = [jax.ShapeDtypeStruct((B, N, sq_pad, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, D),
                              lambda b, h, iq, ikv, *_: (b, h, iq, 0))]
    if return_stats:
        out_shape += [
            jax.ShapeDtypeStruct((B, N, sq_pad, LANES), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, 1, block_q, LANES),
                                   lambda b, h, iq, ikv, *_: (b, h, iq, 0))] * 2

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, iq, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, iq, ikv, *_: (b, h, ikv, 0)),
            ],
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # big q blocks (fp32 [bq, bkv] score tile) need headroom past the
            # default scoped-vmem cap; v5e has 128 MiB
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * sq_pad * skv_pad * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * N * sq_pad * skv_pad,
        ),
        # out aliases the (scale-folded, dead-after-call) q buffer: every
        # q tile is fully consumed before its out tile flushes and no tile
        # is revisited, so the kernel is in-place safe — one fewer [B,N,S,D]
        # HBM buffer live across the call (XLA copies iff q has later uses,
        # e.g. the custom_vjp residual save)
        input_output_aliases={1: 0},
        interpret=interpret,
    )(k_lens, q, k, v)

    out = outs[0]
    if sq_pad != Sq:
        out = out[:, :, :Sq]
    if return_stats:
        mo, lo = outs[1], outs[2]
        if sq_pad != Sq:
            mo = mo[:, :, :Sq]
            lo = lo[:, :, :Sq]
        return out, mo[..., 0], lo[..., 0]
    return out


# --------------------------------------------------------------------------
# differentiable wrapper: FA2-style backward kernels
# (kernels/flash_attention_bwd.py) — pallas_call has no autodiff rule, and
# XLA reference attention would materialize the [B,N,S,S] score matrix, so
# this is what makes long-sequence training work on TPU.
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fa_diff(q, k, v, k_lens, sm_scale, block_q, block_kv, window, masked):
    return _flash_attention_pallas(
        q, k, v, k_lens, sm_scale=sm_scale, block_q=block_q,
        block_kv=block_kv, interpret=jax.default_backend() != "tpu",
        window=window, masked=masked)


def _fa_diff_fwd(q, k, v, k_lens, sm_scale, block_q, block_kv, window,
                 masked):
    out, m, l = _flash_attention_pallas(
        q, k, v, k_lens, sm_scale=sm_scale, block_q=block_q,
        block_kv=block_kv, interpret=jax.default_backend() != "tpu",
        window=window, masked=masked, return_stats=True)
    return out, (q, k, v, out, m, l, k_lens)


def _fa_diff_bwd(sm_scale, block_q, block_kv, window, masked, res, do):
    from versecrafter_tpu.kernels.flash_attention_bwd import fa_backward

    q, k, v, out, m, l, k_lens = res
    # The backward kernels hold several fp32 [bq, bkv] tiles at once — the
    # big-q blocks the forward picks for throughput would blow scoped VMEM
    # there, so the backward resolves its own (round-1) tile sizes.
    dq, dk, dv = fa_backward(
        q, k, v, out, m, l, do, k_lens, sm_scale=sm_scale,
        block_q=min(block_q, 1024), block_kv=min(block_kv, 1024),
        interpret=jax.default_backend() != "tpu",
        window=window, masked=masked)
    import numpy as np
    dk_lens = np.zeros(k_lens.shape, jax.dtypes.float0)  # int arg: no grad
    return dq, dk, dv, dk_lens


_fa_diff.defvjp(_fa_diff_fwd, _fa_diff_bwd)


def attention_reference(q, k, v, k_lens=None, sm_scale=None,
                        window_size=(-1, -1)):
    """XLA reference attention (fp32 softmax). Same [B, N, S, D] layout and
    masking semantics as the Pallas kernel; used for tests, CPU runs, and
    small KV (text cross-attention is 512 tokens — not worth a kernel)."""
    B, N, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    s = jnp.einsum("bnqd,bnkd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * sm_scale
    if k_lens is not None:
        col = jnp.arange(Skv)[None, None, None, :]
        s = jnp.where(col < k_lens[:, None, None, None], s, NEG_INF)
    wl, wr = window_size
    if wl >= 0 or wr >= 0:
        rel = jnp.arange(Skv)[None, :] - jnp.arange(Sq)[:, None]  # k - q
        ok = jnp.ones((Sq, Skv), bool)
        if wl >= 0:
            ok &= rel >= -wl
        if wr >= 0:
            ok &= rel <= wr
        s = jnp.where(ok[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bnqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: int = 1024,
    impl: str = "auto",
    window_size: tuple = (-1, -1),
) -> jnp.ndarray:
    """Attention over [B, N, S, D] tensors with optional per-batch KV lengths
    and an optional sliding window.

    window_size: (left, right) token window per query, -1 = unbounded on that
    side — the `window_size` contract of the reference attention dispatch
    (wan_transformer3d.py:353,399; always (-1,-1) in shipped configs). The
    kernel skips KV tiles fully outside the window, so a local window also
    cuts compute, not just masks it. Causal attention is window_size=(-1, 0).

    impl: 'pallas' (TPU kernel), 'xla' (reference math), or 'auto'
    (pallas on TPU, xla elsewhere — keeps tests runnable on the virtual CPU
    mesh without interpret-mode overhead).
    """
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4
    B, N, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return attention_reference(q, k, v, k_lens=k_lens, sm_scale=sm_scale,
                                   window_size=window_size)

    block_q = _pick_block_q(Sq) if block_q is None else min(block_q, _ceil_to(Sq, 128))
    block_kv = min(block_kv, _ceil_to(Skv, 128))
    masked = k_lens is not None  # (padding re-enables it internally)
    if k_lens is None:
        k_lens = jnp.full((B,), Skv, dtype=jnp.int32)
    else:
        k_lens = jnp.minimum(k_lens.astype(jnp.int32), Skv)
    return _fa_diff(
        q, k, v, k_lens, float(sm_scale), block_q, block_kv,
        (int(window_size[0]), int(window_size[1])), masked,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fa_stats_diff(q, k, v, sm_scale, block_q, block_kv):
    return _flash_attention_pallas(
        q, k, v, jnp.full((q.shape[0],), k.shape[2], jnp.int32),
        sm_scale=sm_scale, block_q=block_q, block_kv=block_kv,
        interpret=jax.default_backend() != "tpu", return_stats=True,
        masked=False)


def _fa_stats_diff_fwd(q, k, v, sm_scale, block_q, block_kv):
    out, m, l = _fa_stats_diff(q, k, v, sm_scale, block_q, block_kv)
    return (out, m, l), (q, k, v, out, m, l)


def _fa_stats_diff_bwd(sm_scale, block_q, block_kv, res, cts):
    from versecrafter_tpu.kernels.flash_attention_bwd import fa_backward

    q, k, v, out, m, l = res
    do, _dm, _dl = cts  # m/l are non-differentiable outputs (see docstring)
    k_lens = jnp.full((q.shape[0],), k.shape[2], jnp.int32)
    dq, dk, dv = fa_backward(
        q, k, v, out, m, l, do, k_lens, sm_scale=sm_scale,
        block_q=min(block_q, 1024), block_kv=min(block_kv, 1024),
        interpret=jax.default_backend() != "tpu",
        window=(-1, -1), masked=False)
    return dq, dk, dv


_fa_stats_diff.defvjp(_fa_stats_diff_fwd, _fa_stats_diff_bwd)


def flash_attention_with_stats(q, k, v, sm_scale: Optional[float] = None,
                               block_q: Optional[int] = None,
                               block_kv: int = 1024,
                               impl: str = "auto"):
    """Attention that also returns the online-softmax statistics
    (out, running_max m [B,N,Sq], sum-of-exp l [B,N,Sq]) — the residuals
    ring attention needs to merge partial results across KV shards.

    Differentiable through `out` (FA2-style backward kernels). The m/l
    outputs are diagnostics of the softmax, not an independent compute
    path — their cotangents are ignored (the ring path differentiates its
    merge with its own custom backward; see kernels/ring_attention.py)."""
    B, N, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        s = jnp.einsum("bnqd,bnkd->bnqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * sm_scale
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", p / l[..., None],
                         v.astype(jnp.float32)).astype(q.dtype)
        # match the pallas path's contract: stats are non-differentiable on
        # every backend (otherwise CPU and TPU grads silently disagree)
        return out, jax.lax.stop_gradient(m), jax.lax.stop_gradient(l)
    block_q = _pick_block_q(Sq) if block_q is None else min(block_q, _ceil_to(Sq, 128))
    block_kv = min(block_kv, _ceil_to(Skv, 128))
    return _fa_stats_diff(q, k, v, float(sm_scale), block_q, block_kv)


# --------------------------------------------------------------------------
# fused qk-RMSNorm + RoPE + attention (inference fast path)
#
# The reference applies WanRMSNorm and rope_apply to q/k as separate tensor
# passes before its flash-attn dispatch (wan_transformer3d.py:391-399); at
# 32,760 tokens those are ~0.35 s/step of pure fp32 HBM bandwidth, plus the
# [B,S,D]<->[B,N,S,D] relayouts around the kernel. Here the norm scale +
# rotation run inside the attention kernel's q/k tile prologue (SURVEY §2.3
# "fused RMSNorm+RoPE inside the Pallas attention kernel") and the kernel
# reads/writes the projections' native [B, S, N, D] layout directly, so the
# only remaining outside work is the per-row RMS statistic (it spans ALL
# heads, so a per-head tile can't compute it) — one read of q/k producing a
# [B,S,1] vector, with sm_scale*log2e folded in for free.
# --------------------------------------------------------------------------

# resident cos/sin tables above this size would crowd out the score tile;
# fall back to the unfused path (only reachable at ~100k+ token single-chip
# shapes — longer sequences run sequence-parallel, which is unfused anyway)
MAX_TABLE_BYTES = 48 * 1024 * 1024

# resident-KV mode budget: the estimated working set must leave Mosaic
# headroom inside the 110 MiB scoped-VMEM cap (v5e has 128 MiB)
RESIDENT_KV_VMEM_BUDGET = 100 * 1024 * 1024

# q-block candidates for the resident-KV mode, tried in order against the
# VMEM budget (module-level so geometry probes can sweep alternatives).
# 4096 measured faster than the pad-free divisor 3,640 at 32,760 tokens;
# larger candidates became feasible when the k-stat window went from
# full-resident to tile-mapped (-33 MiB at 480p) but are unmeasured.
RESIDENT_BLOCK_Q_CANDIDATES = (4096, 2048)

# kv-block cap for the fused self-attention geometry (module-level so
# geometry sweeps can override it alongside RESIDENT_BLOCK_Q_CANDIDATES;
# 1024 measured best in the round-2 sweep — 936 pad-free was +273 ms).
FUSED_BLOCK_KV_CAP = 1024


def _divisor_block(seq: int, cap: int, step: int = 16) -> Optional[int]:
    """Largest multiple-of-`step` block <= cap that divides seq exactly
    (bf16 sublane tiling wants multiples of 16), or None."""
    for b in range((min(cap, seq) // step) * step, step - 1, -step):
        if seq % b == 0:
            return b
    return None


def _fused_block_geometry(seq: int, head_dim: int, window: tuple = (-1, -1),
                          block_kv_cap: Optional[int] = None):
    """The (block_q, block_kv, resident_kv, blocked_tables) the fused
    SELF-attention dispatch uses at this sequence length — one source of
    truth shared by _fused_qk_diff, prepare_fused_rope_tables and
    resident_kv_available so table padding and the mode gate can't drift
    from the kernel call.

    Divisor-of-S blocks that avoid the pad copies were MEASURED SLOWER than
    flat aligned blocks on the geoada step (bq 3,640 vs 4,096: +100 ms;
    bkv 936 vs 1,024: +273 ms) — block alignment beats pad avoidance, so
    both dims keep the flat picks and the ~0.6 ms/call pad copies stay —
    EXCEPT above 70k tokens, where the priority inverts from speed to
    HBM: at 75,600 tok the padded q/k/v/out copies are 740 MB each and
    pad-size mixing drove 32% temp fragmentation on the 14B GeoAdapter
    720p step (2.1 GB), so there the dispatch prefers the largest
    multiple-of-16 divisors (1680/1008 at 75,600) when resident-KV still
    fits with them; the sub-1% step slowdown buys the single-chip fit.

    blocked_tables: at 32,760 tokens the full [S_pad, D] cos/sin residents
    fit next to the resident V + rotated-K scratch, and that measured
    config is preserved exactly. At 75,600 (720p) they don't (~135 MiB
    working set) — there the tables switch to block-mapped tiles keyed on
    the q/k grid indices (~5 MiB streamed instead of 38.8 MiB resident),
    which brings resident-KV mode in budget at block_q 4096/2048."""
    window = (int(window[0]), int(window[1]))
    if block_kv_cap is None:
        block_kv_cap = FUSED_BLOCK_KV_CAP
    block_q = _pick_block_q(seq)
    block_kv = min(block_kv_cap, _ceil_to(seq, 128))
    if seq > 70_000:
        dq = _divisor_block(seq, 2048)
        dkv = _divisor_block(seq, block_kv_cap)
        if dq and dkv:
            for blocked in (False, True):
                if _use_resident_kv(seq, seq, dq, dkv, head_dim, window,
                                    blocked_tables=blocked):
                    return dq, dkv, True, blocked
    for bq_res in RESIDENT_BLOCK_Q_CANDIDATES:
        bq_res = min(block_q, bq_res)
        for blocked in (False, True):
            if _use_resident_kv(seq, seq, bq_res, block_kv, head_dim,
                                window, blocked_tables=blocked):
                return bq_res, block_kv, True, blocked
    return block_q, block_kv, False, False


def resident_kv_available(seq: int, head_dim: int,
                          window: tuple = (-1, -1)) -> bool:
    """Whether the fused self-attention dispatch will run in resident-KV
    mode at this sequence length (same block geometry it would pick). Model
    code uses this to decide WHERE to fuse: GeoAdapter programs only win
    with the resident kernel (the streaming flavor's strided K/V
    re-streaming is context-sensitive and measured +70-110 ms/step there —
    scripts/trace_fused_geoada.py), while plain programs win either way."""
    return _fused_block_geometry(seq, head_dim, window)[2]


def fused_tables_blocked(seq: int, head_dim: int,
                         window: tuple = (-1, -1)) -> bool:
    """Whether the dispatch at this sequence needs BLOCKED (tile-mapped)
    rope tables to fit resident-KV mode in VMEM (True from ~720p's 75,600
    tokens up). Model code gates on this: the blocked-table resident mode
    measured a WIN for geoada programs (-568 ms/step at 720p) but a LOSS
    for plain ones (+699 ms vs unfused — bench_fused_ablation --res 720),
    so plain models stay unfused at blocked-table sequences."""
    geo = _fused_block_geometry(seq, head_dim, window)
    return geo[2] and geo[3]


def _use_resident_kv(sq: int, skv: int, block_q: int, block_kv: int,
                     d: int, window: tuple,
                     blocked_tables: bool = False) -> bool:
    """Gate for the fused kernel's resident-KV mode: unwindowed only (the
    rotate-once pass skips KV tiles a later q block's window would need) and
    the working set must fit the VMEM budget. Module-level budget so tests
    can force the streaming path."""
    if window != (-1, -1):
        return False
    sq_pad = _ceil_to(sq, block_q)
    skv_pad = _ceil_to(skv, block_kv)
    return (_resident_kv_vmem_bytes(sq_pad, skv_pad, block_q, block_kv, d,
                                    blocked_tables)
            <= RESIDENT_KV_VMEM_BUDGET)


def _resident_kv_vmem_bytes(sq_pad: int, skv_pad: int, block_q: int,
                            block_kv: int, d: int,
                            blocked_tables: bool = False) -> int:
    """Upper-bound VMEM working set of the fused kernel's resident-KV mode
    (residents counted twice where Mosaic double-buffers across the
    (b, h)-boundary prefetch). At the 480p x 81f point (32,768 pad) this is
    ~85 MiB with full-resident tables -> resident; at 720p (75,776)
    ~135 MiB -> the tables switch to block-mapped tiles (~96 MiB total)."""
    bf16 = 2
    v_res = 2 * skv_pad * d * bf16           # resident V, double-buffered
    krot = skv_pad * d * bf16                # rotated-K scratch
    if blocked_tables:                       # cos+sin x (q tile + k tile),
        tables = 2 * 2 * (block_q + block_kv) * d * bf16  # double-buffered
    else:
        tables = 2 * max(sq_pad, skv_pad) * d * bf16
    score = block_q * block_kv * (4 + bf16)  # fp32 s tile + bf16 p
    q_io = 2 * 2 * block_q * d * bf16        # q in + out, double-buffered
    k_stream = 2 * block_kv * d * bf16
    # [rows, 1] f32 rstat windows lane-pad to [rows, LANES] in VMEM (a
    # full-resident k-stat would be 74 MiB at 75,776 rows — both are
    # tile-mapped, but the padded tiles still cost real bytes)
    rstat = 2 * (block_q + block_kv) * LANES * 4
    softmax = block_q * (2 * LANES * 4 + d * 4 + d * bf16)
    return v_res + krot + tables + score + q_io + k_stream + rstat + softmax


@functools.partial(
    jax.jit,
    static_argnames=("head_dim", "block_q", "block_kv", "interpret", "window",
                     "masked", "resident_kv", "blocked_tables", "int8_score"),
)
def _flash_attention_fused_pallas(q, k, v, k_lens, rstat_q, rstat_k,
                                  cos_i, sin_i, gq, gk, *, head_dim, block_q,
                                  block_kv, interpret, window=(-1, -1),
                                  masked=True, resident_kv=False,
                                  blocked_tables=False, int8_score=False):
    """q/k/v [B, S, N*head_dim] RAW projection outputs (native layout — the
    per-head slice is selected by the LANE-dim block index, so no relayout
    ever materializes); rstat_[qk] [B, S, 1] fp32 per-row rsqrt stats
    (sm_scale*log2e folded into rstat_q); cos_i/sin_i [S, head_dim]
    interleaved rope tables (bf16) or None for the norm-only cross-attention
    flavor; g[qk] [N, 1, head_dim] fp32 per-head norm-scale slices.
    Returns [B, S, N*head_dim]."""
    B, Sq, DF = q.shape
    D = head_dim
    N = DF // D
    Skv = k.shape[1]
    rope = cos_i is not None

    sq_pad = _ceil_to(Sq, block_q)
    skv_pad = _ceil_to(Skv, block_kv)
    s_pad = max(sq_pad, skv_pad)  # one table covers both q and k rows
    if sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - Sq), (0, 0)))
        rstat_q = jnp.pad(rstat_q, ((0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        k = jnp.pad(k, ((0, 0), (0, skv_pad - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_pad - Skv), (0, 0)))
        rstat_k = jnp.pad(rstat_k, ((0, 0), (0, skv_pad - Skv), (0, 0)))
        masked = True  # padded keys must not contribute
    if rope and cos_i.shape[0] != s_pad:
        if cos_i.shape[0] > s_pad:
            # pre-padded with a different geometry (e.g. tables hoisted
            # without the window the dispatch later applied) — rows past
            # s_pad are padding either way, so slicing is always safe
            cos_i, sin_i = cos_i[:s_pad], sin_i[:s_pad]
        else:
            cos_i = jnp.pad(cos_i, ((0, s_pad - cos_i.shape[0]), (0, 0)))
            sin_i = jnp.pad(sin_i, ((0, s_pad - sin_i.shape[0]), (0, 0)))

    num_kv_blocks = skv_pad // block_kv
    grid = (B, N, sq_pad // block_q, num_kv_blocks)

    # resident_kv (decided by the caller — see _use_resident_kv): hold the
    # per-(b,h) V slice resident in VMEM and rotate K ONCE into a resident
    # scratch on the iq == 0 pass, instead of re-streaming + re-transforming
    # K/V for every q block (7x redundant HBM traffic at 32,760 tokens; the
    # strided 256-byte-row reads of the flat layout are the fused kernel's
    # one DMA weakness, so cutting their volume matters more here than it
    # did for the [B,N,S,D] kernel).
    resident_kv = resident_kv and rope
    blocked_tables = blocked_tables and resident_kv
    int8_score = int8_score and rope  # rope flavors only (not cross-attn)

    kernel = functools.partial(
        _fa_kernel, block_q=block_q, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks, window=window, masked=masked,
        stats=False, fused=True, interpret=interpret, rope=rope,
        resident_kv=resident_kv, blocked_tables=blocked_tables,
        int8_score=int8_score,
    )

    const2 = lambda *_: (0, 0)
    if blocked_tables:
        # Long-sequence resident mode: the full [s_pad, D] cos/sin residents
        # don't fit next to resident V + rotated-K, so each table is passed
        # TWICE with tile-sized block maps instead — a q-row tile keyed on
        # iq (the q transform only runs at ikv == 0, exactly when a fresh iq
        # tile has arrived) and a k-row tile following k's rotate-once map
        # (fresh tiles while iq == 0, pinned afterwards: the rotated-K
        # scratch makes the k tables dead for iq > 0).
        table_in = [q, k, v, rstat_q, rstat_k, cos_i, sin_i, cos_i, sin_i,
                    gq, gk]
        q_table = pl.BlockSpec((block_q, D), lambda b, h, iq, ikv, *_: (iq, 0))
        k_table = pl.BlockSpec(
            (block_kv, D),
            lambda b, h, iq, ikv, *_: (jnp.where(iq == 0, ikv, 0), 0))
        table_specs = [q_table, q_table, k_table, k_table]
    elif rope:
        table_in = [q, k, v, rstat_q, rstat_k, cos_i, sin_i, gq, gk]
        table_specs = [
            # full-array residents: constant index map -> fetched once
            pl.BlockSpec((s_pad, D), const2),
            pl.BlockSpec((s_pad, D), const2),
        ]
    else:
        table_in = [q, k, v, rstat_q, rstat_k, gq, gk]
        table_specs = []
    if resident_kv:
        # K streams fresh tiles only while iq == 0 (the rotate-once pass);
        # for iq > 0 the index map pins tile 0 — same block index between
        # consecutive grid steps, so no re-fetch happens and the kernel
        # reads the rotated scratch instead.
        k_spec = pl.BlockSpec(
            (1, block_kv, D),
            lambda b, h, iq, ikv, *_: (b, jnp.where(iq == 0, ikv, 0), h))
        v_spec = pl.BlockSpec((1, skv_pad, D),
                              lambda b, h, iq, ikv, *_: (b, 0, h))
        # k's row stats follow k's rotate-once map: only the CURRENT kv
        # tile is needed while rotating, and a full-resident [skv_pad, 1]
        # f32 window lane-pads 128x in VMEM (74 MiB at 75,776 rows — the
        # single biggest allocation of the first 720p compile attempt).
        ks_spec = pl.BlockSpec(
            (1, block_kv, 1),
            lambda b, h, iq, ikv, *_: (b, jnp.where(iq == 0, ikv, 0), 0))
        # rotated K resident: int8 scoring stores the QUANTIZED rows (half
        # the VMEM of the bf16 resident)
        extra_scratch = [pltpu.VMEM(
            (skv_pad, D), jnp.int8 if int8_score else q.dtype)]
    else:
        k_spec = pl.BlockSpec((1, block_kv, D),
                              lambda b, h, iq, ikv, *_: (b, ikv, h))
        v_spec = pl.BlockSpec((1, block_kv, D),
                              lambda b, h, iq, ikv, *_: (b, ikv, h))
        ks_spec = pl.BlockSpec((1, block_kv, 1),
                               lambda b, h, iq, ikv, *_: (b, ikv, 0))
        extra_scratch = []
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, sq_pad, DF), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, iq, ikv, *_: (b, iq, h)),
                k_spec,
                v_spec,
                pl.BlockSpec((1, block_q, 1),
                             lambda b, h, iq, ikv, *_: (b, iq, 0)),
                ks_spec,
                *table_specs,
                pl.BlockSpec((1, 1, D), lambda b, h, iq, ikv, *_: (h, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda b, h, iq, ikv, *_: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D),
                                   lambda b, h, iq, ikv, *_: (b, iq, h)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
                # transformed q tile (quantized rows under int8 scoring)
                pltpu.VMEM((block_q, D),
                           jnp.int8 if int8_score else q.dtype),
                *extra_scratch,
                *([pltpu.VMEM((block_q, LANES), jnp.float32)]
                  if int8_score else []),        # per-row q scales
                *([pltpu.VMEM((1, skv_pad), jnp.float32)]
                  if int8_score and resident_kv else []),  # k scales
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            # resident mode: iq must NOT be split across megacores (v5p has
            # two) — a core starting at iq > 0 would read a rotated-K
            # scratch it never wrote. batch/head stay parallel, which is
            # where a megacore split belongs at these grids anyway.
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary", "arbitrary")
                if resident_kv else
                ("parallel", "parallel", "parallel", "arbitrary")),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * sq_pad * skv_pad * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize
            + ((cos_i.size + sin_i.size) * cos_i.dtype.itemsize if rope else 0),
            transcendentals=B * N * sq_pad * skv_pad,
        ),
        # out aliases q (see _flash_attention_pallas): q[b, iq, h] is read
        # once at its ikv == 0 arrival and out[b, iq, h] flushes only after
        # that iq's kv loop — in-place safe, and at 75,600 tokens this is
        # one fewer 738 MB step temp (the 720p 14B OOM margin)
        input_output_aliases={1: 0},
        interpret=interpret,
    )(k_lens, *table_in)

    if sq_pad != Sq:
        out = out[:, :Sq]
    return out


def _unfused_rope_rms_attention(q, k, v, cos, sin, gq, gk, num_heads, eps,
                                sm_scale, window, impl):
    """The separate-passes reference math the fused kernel replaces (and the
    path every backend other than compiled-pallas uses): full-dim RMSNorm,
    pairwise rope, head split, flash attention. Matches wan_dit's historical
    _self_attention body exactly."""
    from versecrafter_tpu.kernels.norms import rms_norm
    from versecrafter_tpu.kernels.rope import apply_rope

    b, s, d = q.shape
    n = num_heads
    hd = d // n
    if gq is not None:
        q = rms_norm(q, gq, eps)
        k = rms_norm(k, gk, eps)
    q = apply_rope(q.reshape(b, s, n, hd), cos, sin)
    k = apply_rope(k.reshape(b, s, n, hd), cos, sin)
    v = v.reshape(b, s, n, hd)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    out = flash_attention(q, k, v, sm_scale=sm_scale, impl=impl,
                          window_size=window)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


def prepare_fused_rope_tables(cos, sin, block_kv: Optional[int] = None,
                              window: tuple = (-1, -1)):
    """Interleave + cast + pad the rope tables ONCE per forward (wan_dit
    hoists this out of the scanned blocks; rebuilding the [S_pad, D] bf16
    pair inside every layer is redundant work and extra per-iteration
    buffers in the XLA while loop). Uses the same block geometry the fused
    dispatch picks — pass the model's window_size so windowed programs pad
    with the geometry the dispatch will actually choose (windowed never
    runs resident, which changes block_q and hence the pad)."""
    from versecrafter_tpu.kernels.rope import interleave_rope_tables

    s = cos.shape[0]
    # interleaved tables are full-width: head_dim = 2 x half-width
    bq, bkv, _, _ = _fused_block_geometry(s, 2 * cos.shape[1], window=window,
                                          block_kv_cap=block_kv)
    s_pad = max(_ceil_to(s, bq), _ceil_to(s, bkv))
    ci, si = interleave_rope_tables(cos, sin)
    ci = ci.astype(jnp.bfloat16)
    si = si.astype(jnp.bfloat16)
    if ci.shape[0] != s_pad:
        ci = jnp.pad(ci, ((0, s_pad - ci.shape[0]), (0, 0)))
        si = jnp.pad(si, ((0, s_pad - si.shape[0]), (0, 0)))
    return ci, si


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16))
def _fused_qk_diff(q, k, v, rq, rk, cos, sin, gq, gk, cos_i, sin_i,
                   num_heads, eps, sm_scale, window, interpret,
                   int8_score=False):
    """rq/rk: raw row statistics already computed by the projection matmul
    epilogue (kernels/matmul_stat.py) or None — the dispatch then reduces
    over the model dim itself (the ~2 ms/call standalone pass)."""
    b, s, d = q.shape
    n = num_heads
    hd = d // n

    scale_q = sm_scale * LOG2E
    use_rs = rq is not None and gq is not None
    if gq is not None:
        if not use_rs:
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            rq = jax.lax.rsqrt(
                jnp.mean(qf * qf, axis=-1, keepdims=True) + eps)
            rk = jax.lax.rsqrt(
                jnp.mean(kf * kf, axis=-1, keepdims=True) + eps)
        rqs = rq * scale_q
        rks = rk
        gq_heads = gq.astype(jnp.float32).reshape(n, 1, hd)
        gk_heads = gk.astype(jnp.float32).reshape(n, 1, hd)
    else:
        rqs = jnp.full((b, s, 1), scale_q, jnp.float32)
        rks = jnp.ones((b, s, 1), jnp.float32)
        gq_heads = jnp.ones((n, 1, hd), jnp.float32)
        gk_heads = jnp.ones((n, 1, hd), jnp.float32)

    if cos_i is None:
        cos_i, sin_i = prepare_fused_rope_tables(cos, sin)

    # resident-KV mode trades q-block size for the resident V + rotated-K
    # buffers: the throughput-optimal bq~4.7-5k plus the residents overflows
    # scoped VMEM (measured 123.1M vs the 122M cap at bq=4680). bq=4096
    # fits with margin — and measured 100 ms/step FASTER than the divisor
    # pick 3,640 despite 3,640 removing the q-pad and output-slice copies
    # (5,227.8 vs 5,327.9 ms on the geoada step), so the flat power-of-two
    # block wins over pad-avoidance here.
    block_q, block_kv, resident_kv, blocked_tables = \
        _fused_block_geometry(s, hd, window)
    k_lens = jnp.full((b,), s, jnp.int32)

    return _flash_attention_fused_pallas(
        q, k, v, k_lens, rqs, rks, cos_i, sin_i, gq_heads, gk_heads,
        head_dim=hd, block_q=block_q, block_kv=block_kv,
        interpret=interpret, window=window, masked=False,
        resident_kv=resident_kv, blocked_tables=blocked_tables,
        int8_score=int8_score)


def _unfused_qk_dispatch(q, k, v, rq, rk, cos, sin, gq, gk, num_heads, eps,
                         sm_scale, window):
    """The exact separate-passes math for either stat source (jax.grad
    path and fwd rule): producer stats when given, self-reduced otherwise."""
    if rq is not None and gq is not None:
        return _unfused_rope_rms_attention_rs(
            q, k, v, rq, rk, cos, sin, gq, gk, num_heads, eps, sm_scale,
            window, "auto")
    return _unfused_rope_rms_attention(q, k, v, cos, sin, gq, gk, num_heads,
                                       eps, sm_scale, window, "auto")


def _fused_qk_diff_fwd(q, k, v, rq, rk, cos, sin, gq, gk, cos_i, sin_i,
                       num_heads, eps, sm_scale, window, interpret,
                       int8_score=False):
    # under jax.grad the forward runs the UNFUSED math — training keeps the
    # stats-path numerics rule (see _fa_kernel docstring); the fused exp2
    # kernel stays inference-only
    out = _unfused_qk_dispatch(q, k, v, rq, rk, cos, sin, gq, gk, num_heads,
                               eps, sm_scale, window)
    return out, (q, k, v, rq, rk, cos, sin, gq, gk, cos_i, sin_i)


def _fused_qk_diff_bwd(num_heads, eps, sm_scale, window, interpret,
                       int8_score, res, do):
    q, k, v, rq, rk, cos, sin, gq, gk, cos_i, sin_i = res
    use_rs = rq is not None and gq is not None

    if use_rs:
        def f(q, k, v, rq, rk, gq, gk):
            return _unfused_qk_dispatch(q, k, v, rq, rk, cos, sin, gq, gk,
                                        num_heads, eps, sm_scale, window)

        _, vjp = jax.vjp(f, q, k, v, rq, rk, gq, gk)
        dq, dk, dv, drq, drk, dgq, dgk = vjp(do)
    else:
        def f(q, k, v, gq, gk):
            return _unfused_qk_dispatch(q, k, v, None, None, cos, sin, gq,
                                        gk, num_heads, eps, sm_scale, window)

        _, vjp = jax.vjp(f, q, k, v, gq, gk)
        dq, dk, dv, dgq, dgk = vjp(do)
        drq = drk = None
    # rope tables are constants (host-built angle grids) — no cotangent flows
    return (dq, dk, dv, drq, drk, jnp.zeros_like(cos), jnp.zeros_like(sin),
            dgq, dgk,
            None if cos_i is None else jnp.zeros_like(cos_i),
            None if sin_i is None else jnp.zeros_like(sin_i))


_fused_qk_diff.defvjp(_fused_qk_diff_fwd, _fused_qk_diff_bwd)


# --------------------------------------------------------------------------
# producer-supplied-statistic flavor: the q/k projections computed their own
# row-RMS statistics in the matmul epilogue (kernels/matmul_stat.py), so the
# dispatch must not re-reduce over [B, S, D] — that standalone pass is the
# ~2 ms/call, ~100 GB/s wall the epilogue fusion exists to remove.
# --------------------------------------------------------------------------

def _rms_apply(x, rstat, g):
    """rms_norm with the row statistic supplied: identical math/rounding to
    kernels.norms.rms_norm when rstat == rsqrt(mean(x^2, -1) + eps)."""
    xf = x.astype(jnp.float32)
    return (xf * rstat * g.astype(jnp.float32)).astype(x.dtype)


def _unfused_rope_rms_attention_rs(q, k, v, rq, rk, cos, sin, gq, gk,
                                   num_heads, eps, sm_scale, window, impl):
    """Separate-passes reference math with producer-supplied statistics."""
    from versecrafter_tpu.kernels.rope import apply_rope

    b, s, d = q.shape
    n = num_heads
    hd = d // n
    q = _rms_apply(q, rq, gq)
    k = _rms_apply(k, rk, gk)
    q = apply_rope(q.reshape(b, s, n, hd), cos, sin)
    k = apply_rope(k.reshape(b, s, n, hd), cos, sin)
    v = v.reshape(b, s, n, hd)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    out = flash_attention(q, k, v, sm_scale=sm_scale, impl=impl,
                          window_size=window)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)



def fused_rope_rms_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    gq: Optional[jnp.ndarray] = None,
    gk: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    eps: float = 1e-6,
    sm_scale: Optional[float] = None,
    window_size: tuple = (-1, -1),
    impl: str = "auto",
    tables_i=None,
    rstats=None,
    int8_score: bool = False,
) -> jnp.ndarray:
    """Self-attention over [B, S, D] RAW q/k/v projection outputs with
    qk-RMSNorm (scale gq/gk [D], optional) and RoPE (half-width tables
    cos/sin [S, D/num_heads/2]) fused into the attention kernel.

    rstats: optional (rq, rk) [B, S, 1] fp32 raw row statistics
    (rsqrt(mean(q^2, -1) + eps)) already computed by the projection matmul
    epilogue (kernels.matmul_stat.linear_rstat) — the dispatch then skips
    its own full-model-dim reduces. Requires gq/gk.

    int8_score: quantize the transformed q/k tiles per row to int8 inside
    the kernel and run QK^T as an s8 x s8 -> s32 MXU dot (~2x bf16 rate on
    v5e); PV stays bf16. Inference-only approximation (per-row scales;
    softmax damps the ~1/127-relative score noise) — ignored on the
    unfused/xla fallbacks and under jax.grad, which keep exact bf16 math.

    Numerics: the inference primal rounds once to bf16 after the in-tile
    fp32 norm+rotate (vs the unfused path's two roundings) and uses bf16
    rope tables (rounding below the bf16 output rounding) — parity within
    2e-3 bf16. Under jax.grad the forward AND backward use the unfused
    differentiable path, so training numerics are identical to the
    separate-passes path (same rule as _fa_diff's stats-path fwd).

    impl: 'auto' (fused pallas on TPU, unfused xla elsewhere), 'pallas'
    (fused kernel, interpret mode off-TPU), 'xla' (unfused reference)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1] // num_heads)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    s_pad = _ceil_to(q.shape[1], 128)
    hd = q.shape[-1] // num_heads
    table_bytes = 2 * 2 * s_pad * hd
    # the fused layout selects the per-head slice by the LANE-dim block
    # index, so head_dim must tile the 128-lane register exactly on real
    # hardware (interpret mode has no such constraint; production Wan
    # head_dim is 128)
    bad_hd = jax.default_backend() == "tpu" and hd % 128 != 0
    if impl == "xla" or bad_hd or table_bytes > MAX_TABLE_BYTES:
        if rstats is not None and gq is not None:
            return _unfused_rope_rms_attention_rs(
                q, k, v, rstats[0], rstats[1], cos, sin, gq, gk, num_heads,
                eps, sm_scale, window_size, impl)
        return _unfused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, num_heads, eps, sm_scale,
            window_size, impl)
    cos_i, sin_i = tables_i if tables_i is not None else (None, None)
    rq, rk = rstats if rstats is not None else (None, None)
    return _fused_qk_diff(
        q, k, v, rq, rk, cos, sin, gq, gk, cos_i, sin_i, num_heads,
        float(eps), float(sm_scale),
        (int(window_size[0]), int(window_size[1])),
        jax.default_backend() != "tpu", bool(int8_score))


# --------------------------------------------------------------------------
# fused qk-RMSNorm cross-attention (norm-only flavor: no rope — queries are
# video tokens, keys the 512 text tokens, and the reference applies no
# positional rotation in cross attention, wan_transformer3d.py:408-436)
# --------------------------------------------------------------------------

def _unfused_rms_cross_attention(q, k, v, gq, gk, num_heads, eps, sm_scale,
                                 impl):
    """Separate-passes reference math for cross attention with qk-RMSNorm:
    matches wan_dit._cross_attention's historical body exactly."""
    from versecrafter_tpu.kernels.norms import rms_norm

    b, s, d = q.shape
    n = num_heads
    hd = d // n
    if gq is not None:
        q = rms_norm(q, gq, eps)
        k = rms_norm(k, gk, eps)
    q = q.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    out = flash_attention(q, k, v, sm_scale=sm_scale, impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_cross_diff(q, k, v, rq, gq, gk, num_heads, eps, sm_scale,
                      interpret):
    """rq: raw q row statistic from the projection matmul epilogue or None
    (the k statistic spans only the short context axis and is always
    computed here)."""
    b, s, d = q.shape
    n = num_heads
    hd = d // n
    skv = k.shape[1]

    scale_q = sm_scale * LOG2E
    if gq is not None:
        kf = k.astype(jnp.float32)
        if rq is None:
            qf = q.astype(jnp.float32)
            rq = jax.lax.rsqrt(
                jnp.mean(qf * qf, axis=-1, keepdims=True) + eps)
        rqs = rq * scale_q
        rk = jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True) + eps)
        gq_heads = gq.astype(jnp.float32).reshape(n, 1, hd)
        gk_heads = gk.astype(jnp.float32).reshape(n, 1, hd)
    else:
        rqs = jnp.full((b, s, 1), scale_q, jnp.float32)
        rk = jnp.ones((b, skv, 1), jnp.float32)
        gq_heads = jnp.ones((n, 1, hd), jnp.float32)
        gk_heads = jnp.ones((n, 1, hd), jnp.float32)

    return _flash_attention_fused_pallas(
        q, k, v, jnp.full((b,), skv, jnp.int32), rqs, rk, None, None,
        gq_heads, gk_heads, head_dim=hd, block_q=_pick_block_q(s),
        block_kv=min(1024, _ceil_to(skv, 128)), interpret=interpret,
        masked=False)


def _unfused_cross_dispatch(q, k, v, rq, gq, gk, num_heads, eps, sm_scale):
    if rq is not None and gq is not None:
        return _unfused_rms_cross_attention_rs(q, k, v, rq, gq, gk,
                                               num_heads, eps, sm_scale,
                                               "auto")
    return _unfused_rms_cross_attention(q, k, v, gq, gk, num_heads, eps,
                                        sm_scale, "auto")


def _fused_cross_diff_fwd(q, k, v, rq, gq, gk, num_heads, eps, sm_scale,
                          interpret):
    out = _unfused_cross_dispatch(q, k, v, rq, gq, gk, num_heads, eps,
                                  sm_scale)
    return out, (q, k, v, rq, gq, gk)


def _fused_cross_diff_bwd(num_heads, eps, sm_scale, interpret, res, do):
    q, k, v, rq, gq, gk = res
    if rq is not None and gq is not None:
        def f(q, k, v, rq, gq, gk):
            return _unfused_cross_dispatch(q, k, v, rq, gq, gk, num_heads,
                                           eps, sm_scale)

        _, vjp = jax.vjp(f, q, k, v, rq, gq, gk)
        return vjp(do)

    def f(q, k, v, gq, gk):
        return _unfused_cross_dispatch(q, k, v, None, gq, gk, num_heads,
                                       eps, sm_scale)

    _, vjp = jax.vjp(f, q, k, v, gq, gk)
    dq, dk, dv, dgq, dgk = vjp(do)
    return dq, dk, dv, None, dgq, dgk


_fused_cross_diff.defvjp(_fused_cross_diff_fwd, _fused_cross_diff_bwd)


def _unfused_rms_cross_attention_rs(q, k, v, rq, gq, gk, num_heads, eps,
                                    sm_scale, impl):
    """Cross-attention reference math with a producer-supplied q statistic
    (the k statistic spans only the short context axis and stays a plain
    rms_norm)."""
    from versecrafter_tpu.kernels.norms import rms_norm

    b, s, d = q.shape
    n = num_heads
    hd = d // n
    q = _rms_apply(q, rq, gq)
    k = rms_norm(k, gk, eps)
    q = q.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
    out = flash_attention(q, k, v, sm_scale=sm_scale, impl=impl)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)



def fused_rms_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    gq: Optional[jnp.ndarray] = None,
    gk: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    eps: float = 1e-6,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
    rq: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-attention over RAW projection outputs q [B, S, D] (video
    tokens) and k/v [B, Skv, D] (context tokens, e.g. 512 text tokens) with
    qk-RMSNorm fused into the kernel — the norm-only sibling of
    fused_rope_rms_attention: removes the separate q-RMS pass over the long
    video axis and both [B,S,D]<->[B,N,S,D] relayouts. Same numerics/grad
    contract: inference primal is the fused exp2 kernel, under jax.grad the
    unfused path runs.

    rq: optional [B, S, 1] fp32 raw q row statistic from the projection
    matmul epilogue (kernels.matmul_stat.linear_rstat) — skips the
    dispatch's own video-axis reduce. Requires gq."""
    hd = q.shape[-1] // num_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(hd)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    # same lane-dim constraint as fused_rope_rms_attention: head_dim must
    # tile the 128-lane register exactly on real hardware
    bad_hd = jax.default_backend() == "tpu" and hd % 128 != 0
    if impl == "xla" or bad_hd:
        if rq is not None and gq is not None:
            return _unfused_rms_cross_attention_rs(
                q, k, v, rq, gq, gk, num_heads, eps, sm_scale,
                "auto" if bad_hd else impl)
        return _unfused_rms_cross_attention(q, k, v, gq, gk, num_heads, eps,
                                            sm_scale, "auto" if bad_hd
                                            else impl)
    return _fused_cross_diff(q, k, v, rq, gq, gk, num_heads, float(eps),
                             float(sm_scale),
                             jax.default_backend() != "tpu")
