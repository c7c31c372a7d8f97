"""Pallas TPU flash-attention backward kernels.

Standard FA2-style backward from saved (O, logsumexp): recompute the score
tile, then
    p  = exp(s - L)                     dV += pᵀ·dO
    dp = dO·Vᵀ                          dS  = p (dp − Δ),  Δ = rowsum(dO∘O)
    dQ += dS·K · scale                  dK += dSᵀ·Q_scaled

Two kernels: dQ accumulates over KV tiles (grid B,N,q_blocks,kv_blocks), and
dK/dV accumulate over Q tiles (grid B,N,kv_blocks,q_blocks). Both reuse the
forward's k_len / sliding-window tile-skip logic, so masked tiles cost
nothing in the backward either. This is what makes long-sequence TRAINING
feasible on TPU — the reference trains its GeoAdapter through flash-attn's
CUDA backward (wan_transformer3d.py:394-399 under torch autograd); XLA
reference attention would materialize the [B,N,S,S] score matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from versecrafter_tpu.kernels.flash_attention import NEG_INF, _ceil_to

LANES = 128


def _score_mask(s_shape, iq, ikv, block_q, block_kv, k_len, window, masked):
    """Shared score-tile mask (k_len + sliding window); None if nothing to
    mask."""
    wl, wr = window
    mask = None
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + ikv * block_kv
        mask = col < k_len
    if wl >= 0 or wr >= 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + ikv * block_kv
        row = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0) + iq * block_q
        if wl >= 0:
            wm = col >= row - wl
            mask = wm if mask is None else jnp.logical_and(mask, wm)
        if wr >= 0:
            wm = col <= row + wr
            mask = wm if mask is None else jnp.logical_and(mask, wm)
    return mask


def _tile_active(iq, ikv, block_q, block_kv, k_len, window):
    wl, wr = window
    run = ikv * block_kv < k_len
    if wl >= 0:
        run = jnp.logical_and(run, ikv * block_kv + block_kv > iq * block_q - wl)
    if wr >= 0:
        run = jnp.logical_and(
            run, ikv * block_kv <= iq * block_q + block_q - 1 + wr)
    return run


def _tile_full(iq, ikv, block_q, block_kv, k_len, window, masked):
    """True when no element of this (iq, ikv) tile needs masking — fully
    inside k_len and inside the window for every row. The forward kernel's
    tile-exact masking, mirrored here: only boundary tiles pay the
    compare/where on the score tile."""
    wl, wr = window
    full = (ikv + 1) * block_kv <= k_len if masked else jnp.bool_(True)
    if wl >= 0:
        full = jnp.logical_and(
            full, ikv * block_kv >= iq * block_q + block_q - 1 - wl)
    if wr >= 0:
        full = jnp.logical_and(
            full, ikv * block_kv + block_kv - 1 <= iq * block_q + wr)
    return full


def _masked_dispatch(run, iq, ikv, block_q, block_kv, k_len, window, masked,
                     body):
    """Run body(apply_mask) under pl.when, statically dropping the mask ops
    on interior tiles when any masking is configured."""
    wl, wr = window
    if masked or wl >= 0 or wr >= 0:
        full = _tile_full(iq, ikv, block_q, block_kv, k_len, window, masked)

        @pl.when(jnp.logical_and(run, full))
        def _run_full():
            body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
        def _run_masked():
            body(True)
    else:
        @pl.when(run)
        def _run():
            body(False)


def _dq_kernel(klens_ref, qs_ref, k_ref, v_ref, do_ref, L_ref, delta_ref,
               dq_ref, acc_ref, *, sm_scale, block_q, block_kv,
               num_kv_blocks, window, masked):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    k_len = klens_ref[b]

    @pl.when(ikv == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _body(apply_mask):
        qs = qs_ref[0, 0]            # [bq, D]  (scale pre-folded)
        k = k_ref[0, 0]              # [bkv, D]
        v = v_ref[0, 0]
        do = do_ref[0, 0]            # [bq, D]
        L = L_ref[0, 0][:, :1]      # [bq, 1] logsumexp
        delta = delta_ref[0, 0][:, :1]

        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if apply_mask:
            mask = _score_mask(s.shape, iq, ikv, block_q, block_kv, k_len,
                               window, masked)
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - L)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        acc_ref[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                    preferred_element_type=jnp.float32)

    _masked_dispatch(_tile_active(iq, ikv, block_q, block_kv, k_len, window),
                     iq, ikv, block_q, block_kv, k_len, window, masked, _body)

    @pl.when(ikv == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = (acc_ref[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(klens_ref, qs_ref, k_ref, v_ref, do_ref, L_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, block_q, block_kv,
                num_q_blocks, window, masked):
    b = pl.program_id(0)
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    k_len = klens_ref[b]

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def _body(apply_mask):
        qs = qs_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        L = L_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]

        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if apply_mask:
            mask = _score_mask(s.shape, iq, ikv, block_q, block_kv, k_len,
                               window, masked)
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - L)                              # [bq, bkv]
        pb = p.astype(do.dtype)
        dv_acc[...] += jax.lax.dot_general(              # pᵀ · dO
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(qs.dtype)
        dk_acc[...] += jax.lax.dot_general(              # dSᵀ · Q_scaled
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _masked_dispatch(_tile_active(iq, ikv, block_q, block_kv, k_len, window),
                     iq, ikv, block_q, block_kv, k_len, window, masked, _body)

    @pl.when(iq == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_kv", "interpret",
                     "window", "masked"),
)
def fa_backward(q, k, v, out, m, l, do, k_lens, *, sm_scale, block_q,
                block_kv, interpret, window=(-1, -1), masked=True):
    """Compute (dq, dk, dv) from the forward residuals.

    m, l: the forward kernel's per-row online-softmax stats [B, N, Sq]
    (running max of the SCALED scores and sum of exponentials)."""
    B, N, Sq, D = q.shape
    Skv = k.shape[2]

    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    # logsumexp of the scaled scores; fully-masked rows (l == 0) get L = m so
    # p = exp(NEG_INF - m) = 0 everywhere.
    L = m + jnp.log(jnp.maximum(l, 1e-30))
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    sq_pad = _ceil_to(Sq, block_q)
    skv_pad = _ceil_to(Skv, block_kv)
    if sq_pad != Sq:
        pad = ((0, 0), (0, 0), (0, sq_pad - Sq))
        qs = jnp.pad(qs, pad + ((0, 0),))
        do = jnp.pad(do, pad + ((0, 0),))
        # padded rows: L = 0 and s = 0·kᵀ = 0 → p = 1 would poison dk/dv.
        # Give them L = +big so p = exp(0 - big) = 0.
        L = jnp.pad(L, pad, constant_values=-NEG_INF)
        delta = jnp.pad(delta, pad)
    if skv_pad != Skv:
        pad = ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        masked = True

    nq = sq_pad // block_q
    nkv = skv_pad // block_kv

    # [B,N,S] -> [B,N,S,8]: Mosaic tiling wants the last two block dims
    # (divisible by 8, ==array dim); an 8-lane replicate is 16x smaller than
    # a full 128-lane one.
    L = jnp.broadcast_to(L[..., None], (*L.shape, 8))
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_q=block_q,
                          block_kv=block_kv, num_kv_blocks=nkv,
                          window=window, masked=masked),
        out_shape=jax.ShapeDtypeStruct((B, N, sq_pad, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, iq, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, iq, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 8), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 8), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, iq, ikv, *_: (b, h, iq, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_lens, qs, k, v, do, L, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, block_kv=block_kv,
                          num_q_blocks=nq, window=window, masked=masked),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, skv_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, N, skv_pad, D), v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N, nkv, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, ikv, iq, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, ikv, iq, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, ikv, iq, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, ikv, iq, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 8), lambda b, h, ikv, iq, *_: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_q, 8), lambda b, h, ikv, iq, *_: (b, h, iq, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, ikv, iq, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, ikv, iq, *_: (b, h, ikv, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(k_lens, qs, k, v, do, L, delta)

    if sq_pad != Sq:
        dq = dq[:, :, :Sq]
    if skv_pad != Skv:
        dk = dk[:, :, :Skv]
        dv = dv[:, :, :Skv]
    return dq, dk, dv
