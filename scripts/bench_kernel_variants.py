"""A/B bench of flash-attention kernel variants on the real TPU chip.

Variants (cumulative unless noted):
  v0_base      — production kernel as of round 1 (stats always written)
  v1_nostats   — drop the m/l stats outputs (inference path doesn't use them)
  v2_exp2      — fold log2(e) into the q pre-scale, use exp2 on the VPU
  v3_lastmask  — apply the padding/k_lens mask only on tiles that need it
  v4_bf16p     — compute the exp in bf16 (2x VPU rate if packed ops exist)

Then a block-shape sweep of the winner at 32,760 (480p) and 75,600 (720p)
tokens. Guides kernel tuning; not a driver metric (bench.py is).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernel_variants.py
"""

import functools
import json
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = math.log2(math.e)


def _ceil_to(x, m):
    return -(-x // m) * m


def _kernel(klens_ref, q_ref, k_ref, v_ref, o_ref, *outs_and_scratch,
            block_q, block_kv, num_kv_blocks, masked, stats, exp2,
            lastmask, bf16p):
    if stats:
        mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs_and_scratch
    else:
        m_ref, l_ref, acc_ref = outs_and_scratch
    b = pl.program_id(0)
    ikv = pl.program_id(3)
    k_len = klens_ref[b]

    @pl.when(ikv == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    run = ikv * block_kv < k_len
    exp = jnp.exp2 if exp2 else jnp.exp

    def body(apply_mask):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if apply_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ikv * block_kv
            s = jnp.where(col < k_len, s, NEG_INF)
        m_prev = m_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = exp(m_prev[:, :1] - m_next[:, :1])
        if bf16p:
            p = exp((s - m_next[:, :1]).astype(jnp.bfloat16))
            l_ref[...] = alpha * l_ref[...] + jnp.sum(
                p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            p = exp(s - m_next[:, :1])
            l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        v = v_ref[0, 0]
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv

    if masked and lastmask:
        full = (ikv + 1) * block_kv <= k_len

        @pl.when(jnp.logical_and(run, full))
        def _run_full():
            body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
        def _run_partial():
            body(True)
    else:
        @pl.when(run)
        def _run():
            body(masked)

    @pl.when(ikv == num_kv_blocks - 1)
    def _store():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        if stats:
            mo_ref[0, 0] = m_ref[...]
            lo_ref[0, 0] = l_ref[...]


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "block_q", "block_kv", "stats", "exp2", "lastmask", "bf16p"))
def fa(q, k, v, *, sm_scale, block_q, block_kv, stats, exp2, lastmask, bf16p):
    B, N, Sq, D = q.shape
    Skv = k.shape[2]
    scale = sm_scale * (LOG2E if exp2 else 1.0)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    sq_pad = _ceil_to(Sq, block_q)
    skv_pad = _ceil_to(Skv, block_kv)
    masked = False
    if sq_pad != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))
        masked = True
    k_lens = jnp.full((B,), Skv, jnp.int32)

    num_kv_blocks = skv_pad // block_kv
    grid = (B, N, sq_pad // block_q, num_kv_blocks)
    kernel = functools.partial(
        _kernel, block_q=block_q, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks, masked=masked, stats=stats, exp2=exp2,
        lastmask=lastmask, bf16p=bf16p)

    out_shape = [jax.ShapeDtypeStruct((B, N, sq_pad, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, D),
                              lambda b, h, iq, ikv, *_: (b, h, iq, 0))]
    if stats:
        out_shape += [jax.ShapeDtypeStruct((B, N, sq_pad, LANES), jnp.float32)] * 2
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
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * sq_pad * skv_pad * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * N * sq_pad * skv_pad,
        ),
    )(k_lens, q, k, v)
    out = outs[0] if isinstance(outs, (tuple, list)) else outs
    return out[:, :, :Sq]


def main():
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from versecrafter_tpu.kernels.flash_attention import attention_reference

    B, N, D = 2, 12, 128
    sm = 1.0 / math.sqrt(D)

    def bench(S, tag, n=5, **kw):
        ks = jax.random.split(jax.random.key(S), 3)
        q = jax.random.normal(ks[0], (B, N, S, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, N, S, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, N, S, D), jnp.bfloat16)
        try:
            o = fa(q, k, v, sm_scale=sm, **kw)
            _ = float(jnp.abs(o.astype(jnp.float32)).sum())
            t0 = time.perf_counter()
            for _ in range(n):
                o = fa(q, k, v, sm_scale=sm, **kw)
            _ = float(jnp.abs(o.astype(jnp.float32)).sum())
            ms = (time.perf_counter() - t0) / n * 1e3
            tf = 4 * B * N * S * S * D / (ms / 1e3) / 1e12
            # numerics vs reference on a slice (full ref OOMs at big S)
            print(json.dumps({"v": tag, "S": S, "ms": round(ms, 1),
                              "tf_s": round(tf, 1)}))
            return ms, o
        except Exception as e:
            print(json.dumps({"v": tag, "S": S, "error": str(e)[-160:]}))
            return None, None

    S0 = 32760
    variants = [
        ("v0_base", dict(stats=True, exp2=False, lastmask=False, bf16p=False)),
        ("v1_nostats", dict(stats=False, exp2=False, lastmask=False, bf16p=False)),
        ("v2_exp2", dict(stats=False, exp2=True, lastmask=False, bf16p=False)),
        ("v3_lastmask", dict(stats=False, exp2=True, lastmask=True, bf16p=False)),
        ("v4_bf16p", dict(stats=False, exp2=True, lastmask=True, bf16p=True)),
    ]
    results = {}
    outs = {}
    for tag, kw in variants:
        ms, o = bench(S0, tag, block_q=1024, block_kv=1024, **kw)
        results[tag] = ms
        outs[tag] = o

    # numerics: compare each variant to v0 on the real output
    ref = outs["v0_base"]
    if ref is not None:
        for tag in list(outs):
            if outs[tag] is None or tag == "v0_base":
                continue
            d = float(jnp.max(jnp.abs(outs[tag].astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            print(json.dumps({"v": tag, "max_abs_diff_vs_v0": d}))

    # exactness vs XLA reference at small S for the best variant
    Ssmall = 2048
    ks = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(ks[0], (B, N, Ssmall, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, N, Ssmall, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, N, Ssmall, D), jnp.bfloat16)
    want = attention_reference(q, k, v, sm_scale=sm)
    for tag, kw in variants:
        got = fa(q, k, v, sm_scale=sm, block_q=512, block_kv=512, **kw)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(json.dumps({"v": tag, "S": Ssmall, "max_abs_err_vs_xla": d}))

    best = min((t for t in results if results[t]), key=lambda t: results[t])
    kw = dict(variants)[best]
    print(json.dumps({"best": best}))

    for S in (S0, 75600):
        for bq, bkv in [(512, 1024), (1024, 512), (1024, 1024), (2048, 1024),
                        (1024, 2048), (1536, 1024), (1024, 1536), (2048, 512),
                        (512, 2048), (768, 1024), (1024, 768), (2048, 2048)]:
            bench(S, f"{best}_bq{bq}_bkv{bkv}", block_q=bq, block_kv=bkv, **kw)


if __name__ == "__main__":
    main()
