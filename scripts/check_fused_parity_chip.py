"""Kernel-level fused-vs-unfused parity at Wan scale on the real chip.

The model-level parity check in bench_fused_ablation.py needs a randomized
head (the production zero-init head makes a fresh-init forward constant —
any two attention paths diff to a vacuous 0.0). This probes the contract
directly where it lives: one fused_rope_rms_attention call (resident-KV
mode at this shape) vs the separate-passes pallas math, at the bench
operating point (B=2, S=32,760, 12 heads, head_dim 128, bf16).

Round-3 measured result (v5e): max_abs_diff 4.88e-4 at output magnitude
~0.084 — the documented one-vs-two-bf16-rounding envelope (<= 2e-3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_fused_parity_chip.py
"""

import argparse
import json


def main():
    import importlib

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=480, choices=(480, 720),
                    help="480 -> 32,760 tok (resident, full tables); "
                         "720 -> 75,600 tok (resident, blocked tables)")
    args = ap.parse_args()

    import jax

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    fa = importlib.import_module("versecrafter_tpu.kernels.flash_attention")
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles

    grid = (21, 30, 52) if args.res == 480 else (21, 45, 80)
    B, S, N, HD = 2, grid[0] * grid[1] * grid[2], 12, 128
    D = N * HD
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (B, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, D), jnp.bfloat16)
    gq = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    gk = 1.0 + 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(HD))
    cos, sin = grid_cos_sin(ang, *grid)

    fused = jax.jit(lambda q, k, v: fa.fused_rope_rms_attention(
        q, k, v, cos, sin, gq, gk, num_heads=N, impl="pallas"))(q, k, v)
    ref = jax.jit(lambda q, k, v: fa._unfused_rope_rms_attention(
        q, k, v, cos, sin, gq, gk, N, 1e-6, HD ** -0.5, (-1, -1),
        "pallas"))(q, k, v)
    err = float(jnp.max(jnp.abs(fused.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(json.dumps({"metric": "resident_fused_parity_chip",
                      "max_abs_diff": err, "ref_max": scale}), flush=True)
    assert err <= 2e-3, err

    # producer-supplied statistics (kernels/matmul_stat epilogue fusion):
    # the same kernel fed externally-computed rstats must match the
    # self-reducing dispatch at fp32-reduce-order noise
    from versecrafter_tpu.kernels.matmul_stat import linear_rstat

    w = 0.02 * jax.random.normal(ks[0], (D, D), jnp.bfloat16)
    bias = 0.02 * jax.random.normal(ks[1], (D,), jnp.bfloat16)
    x = jax.random.normal(ks[2], (B, S, D), jnp.bfloat16)

    @jax.jit
    def via_epilogue(x):
        qp, rq = linear_rstat({"kernel": w, "bias": bias}, x)
        kp, rk = linear_rstat({"kernel": w, "bias": bias}, x)
        return fa.fused_rope_rms_attention(
            qp, kp, v, cos, sin, gq, gk, num_heads=N, impl="pallas",
            rstats=(rq, rk))

    @jax.jit
    def via_reduce(x):
        qp = jnp.dot(x, w.astype(x.dtype)) + bias
        kp = jnp.dot(x, w.astype(x.dtype)) + bias
        return fa.fused_rope_rms_attention(
            qp, kp, v, cos, sin, gq, gk, num_heads=N, impl="pallas")

    a = via_epilogue(x)
    b = via_reduce(x)
    err2 = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))
    ref2 = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
    print(json.dumps({"metric": "proj_stat_fused_parity_chip",
                      "max_abs_diff": err2, "ref_max": ref2,
                      "max_rel": err2 / ref2}), flush=True)
    # scale-aware bound: the two paths compute q/k through DIFFERENT
    # matmul implementations (pallas epilogue vs XLA dot) whose f32
    # accumulation orders legitimately round a few bf16 outputs one ulp
    # apart; the bf16 output itself then quantizes at ~2^-8 relative. The
    # measured chip value is exactly ONE output ulp (0.0156 at ref_max
    # 2.89 = 0.54% — the same relative agreement the identical-input
    # resident check above shows at its smaller 0.084 scale). Allow 2 ulps.
    assert err2 <= max(2e-3, 2 * 2 ** -8 * ref2), (err2, ref2)


if __name__ == "__main__":
    main()
