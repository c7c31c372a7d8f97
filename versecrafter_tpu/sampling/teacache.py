"""TeaCache: timestep-embedding-aware step skipping, jit-native.

Behavioral contract from the reference (videox_fun TeaCache consumed at
/root/reference/versecrafter/models/wan_transformer3d.py:828-848 with skip
logic :205-245 and residual reuse :1057-1080; coefficients hardcoded at
inference/versecrafter_inference.py:306): accumulate a polynomial-rescaled
relative-L1 distance of the time-modulation tensor e0 across steps; when the
accumulator stays below threshold, skip the transformer blocks and reuse the
previous residual; never skip the first `skip_start` steps; reset the
accumulator whenever a full forward runs. The reference tracks the cond and
uncond CFG branches SEPARATELY (wan_transformer3d.py:205-245 keyed by
`cond_flag`): each branch has its own accumulator and skips independently.

TPU-native design: the decision is a traced per-row vector and the skip is a
`lax.cond` over the blocks section — the whole denoise step stays one
compiled program, no host round-trip and no CPU offload of residuals (the
reference clones residuals to CPU; here they stay device-resident, sharded
like the activations). With the CFG pair batched into one forward, rows skip
independently via a per-row select; the expensive blocks run only when ANY
row needs a fresh pass (identical numerics to the reference's per-branch
caches — a row below threshold always uses its own cached residual)."""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# rescale polynomial for Wan/VerseCrafter 14B (versecrafter_inference.py:306)
VERSECRAFTER_COEFFS = (
    8.10705460e03, 2.13393892e03, -3.72934672e02, 1.66203073e01, -4.17769401e-02
)


class TeaCacheState(NamedTuple):
    prev_mod: jnp.ndarray       # [B, 6, D] fp32 — previous e0
    prev_residual: jnp.ndarray  # [B, S, D] — previous blocks residual, OR
    #                             {"q": s8 [B,S,D], "scale": f32 [B,S,1]}
    #                             when int8-stored (see TEA_RES_QUANT_ROWS)
    accum: jnp.ndarray          # [B] fp32 accumulated rescaled distance
    valid: jnp.ndarray          # [B] bool — prev_mod/res populated


# Store the cached residual int8 (per-token scales) above this many B*S
# rows. At 720p x 81f sequential CFG the two branches' bf16 residuals are
# 1.44 GB of step arguments on a chip where the 14B W4A8 step already
# leaves <1 GB free — int8 halves... quarters them (0.72 GB total) at
# ~0.4% relative error on the residual, far under the W4A8 model error.
# The gate sits above the 480p shapes (CFG-2 batched = 65,520 rows) so
# every chip-validated short-sequence program keeps exact bf16 caching.
TEA_RES_QUANT_ROWS = 70_000

# RECORD-pass residual tracking is row-subsampled above this many B*S rows.
# Recording only needs mean|r_t - r_{t-1}| / mean|r_{t-1}| — a scalar per
# row-batch over a 387M-element field at 720p — and a strided 1/16 row
# subset estimates that to well under the trajectory's own step-to-step
# noise. The full-resolution record state was the difference between
# fitting and not fitting on one v5e: the 14B W4A8 720p x 81f record step
# compiled to 99 MB OVER the 15.75 GB HBM budget carrying the full
# [1, 75600, 5120] int8 cache + its f32 rel-L1 reduce temps (chipq5
# canon720, 2026-08-20); the subsampled state is 46 MB bf16. The GATED
# pass is untouched — it must APPLY the cached residual on skipped steps,
# so it keeps the full [B, S, D] (int8 above TEA_RES_QUANT_ROWS) cache.
TEA_RECORD_SUBSAMPLE_ROWS = 70_000
RECORD_SUBSAMPLE_STRIDE = 16

# Above this many B*S rows, sequential-CFG (batch-1) generations gate
# TeaCache ON HOST instead of with the in-graph lax.cond: the skip metric
# depends only on the e0 trajectory (timestep schedule x time-embedding
# weights — models.wan_dit.wan_dit_e0), so the decision can be taken
# before dispatch and small per-purpose programs run instead: the full
# step returning (pred, fresh_tokens), a follow-up that recomputes the
# cheap embed and stores `fresh - tokens` as the int8 residual, and the
# embed+residual+head skip step. The cond formulation traces both paths
# into one program; at 75,600 tokens its dual-path [1,S,D] temps + 20.8%
# allocator fragmentation pushed the gated 14B W4A8 720p step to 17.33 GB
# on the 15.75 GB v5e (chipq5 canon720 2026-08-20), and even a fused
# calc+store program OOM'd — the store kept the embed tokens live across
# the whole 40-block scan (chipq6 canon720_gated).
# The gate sits above every chip-validated 480p shape, whose single-program
# lax.cond numbers (skipped step ≈ 40 ms) stay untouched.
TEA_HOST_GATE_ROWS = 70_000


class HostTeaState:
    """Host-side accumulator for the host-gated path — the exact decision
    state gated_blocks keeps on device (prev_mod/accum/valid), minus the
    residual cache, which stays device-resident per CFG branch."""

    def __init__(self, batch: int, dim: int):
        self.prev_mod = np.zeros((batch, 6, dim), np.float32)
        self.accum = np.zeros((batch,), np.float32)
        self.valid = np.zeros((batch,), bool)


def host_gate(state: HostTeaState, e0: np.ndarray, step_index: int,
              threshold: float, skip_start: int = 5,
              coefficients=VERSECRAFTER_COEFFS) -> np.ndarray:
    """Numpy replica of gated_blocks' per-row decision; mutates `state`
    (prev_mod/accum/valid advance exactly as the in-graph state would) and
    returns should_calc [B] bool."""
    e0 = np.asarray(e0, np.float32)
    rel = (np.abs(e0 - state.prev_mod).mean(axis=(1, 2))
           / np.maximum(np.abs(state.prev_mod).mean(axis=(1, 2)), 1e-8))
    accum = state.accum + np.polyval(np.asarray(coefficients, np.float64),
                                     rel).astype(np.float32)
    must = (step_index < skip_start) | ~state.valid
    should = must | (accum >= threshold)
    state.accum = np.where(should, 0.0, accum).astype(np.float32)
    state.prev_mod = e0
    state.valid = np.ones_like(state.valid)
    return should


def _store_residual(res: jnp.ndarray, quantize: bool):
    if not quantize:
        return res
    f = res.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(f), axis=-1, keepdims=True),
                        1e-8) / 127.0
    return {"q": jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8),
            "scale": scale}


def _load_residual(stored, dtype):
    if isinstance(stored, dict):
        return (stored["q"].astype(jnp.float32) * stored["scale"]).astype(dtype)
    return stored.astype(dtype)


def res_shape(state: TeaCacheState):
    """[B, S, D] of the cached residual, storage-format-agnostic."""
    r = state.prev_residual
    return (r["q"] if isinstance(r, dict) else r).shape


def init_state(batch: int, seq: int, dim: int, dtype=jnp.bfloat16,
               quantize_residual: Optional[bool] = None) -> TeaCacheState:
    if quantize_residual is None:
        quantize_residual = batch * seq > TEA_RES_QUANT_ROWS
    if quantize_residual:
        res = {"q": jnp.zeros((batch, seq, dim), jnp.int8),
               "scale": jnp.full((batch, seq, 1), 1e-8 / 127.0, jnp.float32)}
    else:
        res = jnp.zeros((batch, seq, dim), dtype)
    return TeaCacheState(
        prev_mod=jnp.zeros((batch, 6, dim), jnp.float32),
        prev_residual=res,
        accum=jnp.zeros((batch,), jnp.float32),
        valid=jnp.zeros((batch,), jnp.bool_),
    )


def _poly(coeffs, x):
    acc = jnp.zeros_like(x)
    for c in coeffs:
        acc = acc * x + c
    return acc


def gated_blocks(
    run_blocks: Callable[[jnp.ndarray], jnp.ndarray],
    tokens: jnp.ndarray,
    e0: jnp.ndarray,
    state: TeaCacheState,
    step_index: jnp.ndarray,
    threshold: float,
    skip_start: int = 5,
    coefficients=VERSECRAFTER_COEFFS,
) -> Tuple[jnp.ndarray, TeaCacheState]:
    """Wrap the transformer-blocks section with the TeaCache gate.

    run_blocks: tokens -> tokens (the expensive part).
    Returns (tokens_out, new_state). Rows (CFG branches) decide
    independently; the blocks run once for the whole batch iff any row
    needs a fresh pass."""
    # per-row relative L1 of the modulation drift (reference rel_l1 per branch)
    rel = (jnp.mean(jnp.abs(e0 - state.prev_mod), axis=(1, 2))
           / jnp.maximum(jnp.mean(jnp.abs(state.prev_mod), axis=(1, 2)), 1e-8))
    accum = state.accum + _poly(coefficients, rel)

    must_calc = jnp.logical_or(
        step_index < skip_start, jnp.logical_not(state.valid))
    should_calc = jnp.logical_or(must_calc, accum >= threshold)  # [B]

    quantized = isinstance(state.prev_residual, dict)
    res_dtype = (None if quantized else state.prev_residual.dtype)

    if tokens.shape[0] == 1:
        # batch-1 (sequential CFG): the decision is one scalar, so compute
        # out/residual INSIDE the cond branches — XLA never holds the fresh
        # and cached paths live together (the where() formulation below cost
        # ~1.5 GB of extra [1,75600,5120] temps on the 720p 14B step)
        def _calc(tk):
            fresh = run_blocks(tk)
            return fresh, _store_residual(
                fresh - tk if quantized
                else (fresh - tk).astype(res_dtype), quantized)

        def _skip(tk):
            return tk + _load_residual(state.prev_residual, tk.dtype), \
                state.prev_residual

        out, residual = jax.lax.cond(should_calc[0], _calc, _skip, tokens)
    else:
        fresh = jax.lax.cond(jnp.any(should_calc), run_blocks,
                             lambda tk: tk, tokens)
        sel = should_calc[:, None, None]
        cached = tokens + _load_residual(state.prev_residual, tokens.dtype)
        out = jnp.where(sel, fresh, cached)
        new_res = _store_residual(
            fresh - tokens if quantized
            else (fresh - tokens).astype(res_dtype), quantized)
        residual = jax.tree_util.tree_map(
            lambda n, o: jnp.where(sel, n, o), new_res, state.prev_residual)
    new_accum = jnp.where(should_calc, 0.0, accum)
    new_state = TeaCacheState(
        prev_mod=e0.astype(jnp.float32),
        prev_residual=residual,
        accum=new_accum,
        valid=jnp.ones_like(state.valid),
    )
    return out, new_state


def fit_teacache_coefficients(rel_e0, rel_residual, degree: int = 4):
    """Fit the rescale polynomial from recorded trajectories — the method
    behind the reference's hardcoded 14B coefficients
    (versecrafter_inference.py:306): polyfit the relative-L1 drift of the
    time-modulation tensor e0 (the cheap observable) against the relative-L1
    drift of the transformer-blocks residual (the quantity TeaCache actually
    wants to bound).

    rel_e0 / rel_residual: 1-D arrays of per-step observations, typically
    pooled over several prompts/seeds (VerseCrafterPipeline.
    record_teacache_stats produces them). Returns `degree+1` coefficients,
    highest power first — directly usable as `coefficients=` in
    enable_teacache / gated_blocks."""
    x = np.asarray(rel_e0, np.float64).ravel()
    y = np.asarray(rel_residual, np.float64).ravel()
    ok = np.isfinite(x) & np.isfinite(y)
    if ok.sum() <= degree:
        raise ValueError(
            f"need more than {degree} finite observations, got {int(ok.sum())}")
    return tuple(np.polyfit(x[ok], y[ok], degree))


def recording_blocks(run_blocks, tokens, e0, state):
    """Always-run variant of gated_blocks that measures what the gate would
    observe: returns (out, new_state) where new_state.accum holds the
    per-row relative-L1 drift of the blocks residual vs the previous step
    (the quantity the rescale polynomial predicts) and prev_mod snapshots
    e0. VerseCrafterPipeline.record_teacache_stats drives this and pairs
    accum with the host-side rel-L1 of consecutive prev_mod snapshots.

    When the state's residual rows are FEWER than the token rows, the state
    was built row-subsampled (init_state seq = ceil(S / stride), see
    TEA_RECORD_SUBSAMPLE_ROWS) and the drift statistic runs on the strided
    subset — the stride is recovered exactly from the two shapes."""
    quantized = isinstance(state.prev_residual, dict)
    fresh = run_blocks(tokens)
    s_full = tokens.shape[1]
    s_sub = res_shape(state)[1]
    stride = max(1, round(s_full / s_sub)) if s_sub else 1
    if s_sub and -(-s_full // stride) != s_sub:
        raise ValueError(
            f"record state rows {s_sub} are not a ceil-strided subset of "
            f"sequence {s_full}")
    residual = fresh[:, ::stride] - tokens[:, ::stride] \
        if stride > 1 else fresh - tokens
    rf = residual.astype(jnp.float32)
    pf = _load_residual(state.prev_residual, jnp.float32)
    rel_res = (jnp.mean(jnp.abs(rf - pf), axis=(1, 2))
               / jnp.maximum(jnp.mean(jnp.abs(pf), axis=(1, 2)), 1e-8))
    new_state = TeaCacheState(
        prev_mod=e0.astype(jnp.float32),
        prev_residual=_store_residual(
            residual if quantized
            else residual.astype(state.prev_residual.dtype), quantized),
        accum=rel_res,
        valid=jnp.ones_like(state.valid),
    )
    return fresh, new_state
