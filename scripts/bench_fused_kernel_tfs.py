"""TF/s of the fused qk-RMS+RoPE attention kernel, resident vs streaming.

Chains the kernel through a lax.scan (each iteration's output feeds the
next q) so per-call time amortizes the axon dispatch overhead and XLA can
neither CSE nor DCE the calls. Reports ms/call and TF/s (4*B*N*S^2*D
flops) at the 480p x 81f point for: resident-KV mode (production default),
streaming mode (RESIDENT_KV_VMEM_BUDGET=0), and the unfused [B,N,S,D]
kernel via the separate-passes path for reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_kernel_tfs.py
"""

import argparse
import importlib
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=480, choices=(480, 720),
                    help="480 -> 32,760 tok (resident, full tables); "
                         "720 -> 75,600 tok (resident, blocked tables)")
    ap.add_argument("--bq", type=int, default=None,
                    help="override RESIDENT_BLOCK_Q_CANDIDATES to this "
                         "single value (geometry sweep)")
    ap.add_argument("--bkv", type=int, default=None,
                    help="override FUSED_BLOCK_KV_CAP to this value "
                         "(geometry sweep)")
    ap.add_argument("--budget_mib", type=int, default=None,
                    help="override RESIDENT_KV_VMEM_BUDGET (MiB)")
    ap.add_argument("--only", choices=("resident", "streaming", "unfused",
                                       "int8"),
                    default=None, help="run a single variant")
    ap.add_argument("--int8", action="store_true",
                    help="also run the resident kernel with int8 QK^T "
                         "scoring (s8 x s8 -> s32 MXU dots; kernel-level "
                         "speedup + parity vs the bf16-score kernel)")
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
    LOOP = 8
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (B, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, D), jnp.bfloat16)
    gq = 1.0 + 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    gk = 1.0 + 0.1 * jax.random.normal(ks[4], (D,), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(HD))
    cos, sin = grid_cos_sin(ang, *grid)
    flops_per_call = 4 * B * N * S * S * HD

    def run(tag, fn, iters=3):
        # the operands are jit ARGUMENTS, not closure captures: captured
        # device arrays lower as literal constants in the StableHLO module,
        # and at 720p the 464 MB k/v literals blow the axon remote-compile
        # HTTP body limit (observed: "HTTP 413 length limit exceeded")
        def chain(q0, kk, vv, cc, ss, ggq, ggk):
            def body(qc, _):
                return fn(qc, kk, vv, cc, ss, ggq, ggk), None
            return jax.lax.scan(body, q0, None, length=LOOP)[0]

        f = jax.jit(chain)
        out = f(q, k, v, cos, sin, gq, gk)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(q, k, v, cos, sin, gq, gk)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        ms = (time.perf_counter() - t0) / (iters * LOOP) * 1e3
        print(json.dumps({"variant": tag, "ms_per_call": round(ms, 2),
                          "tf_s": round(flops_per_call / ms / 1e9, 1)}),
              flush=True)

    fused = lambda qc, kk, vv, cc, ss, ggq, ggk: fa.fused_rope_rms_attention(
        qc, kk, vv, cc, ss, ggq, ggk, num_heads=N, impl="pallas")
    fused_i8 = (
        lambda qc, kk, vv, cc, ss, ggq, ggk: fa.fused_rope_rms_attention(
            qc, kk, vv, cc, ss, ggq, ggk, num_heads=N, impl="pallas",
            int8_score=True))
    unfused = (
        lambda qc, kk, vv, cc, ss, ggq, ggk: fa._unfused_rope_rms_attention(
            qc, kk, vv, cc, ss, ggq, ggk, N, 1e-6, HD ** -0.5, (-1, -1),
            "pallas"))

    if args.bq is not None:
        fa.RESIDENT_BLOCK_Q_CANDIDATES = (args.bq,)
    if args.bkv is not None:
        fa.FUSED_BLOCK_KV_CAP = args.bkv
    if args.budget_mib is not None:
        fa.RESIDENT_KV_VMEM_BUDGET = args.budget_mib * 1024 * 1024
    geo = fa._fused_block_geometry(S, HD)
    print(json.dumps({"geometry": {"block_q": geo[0], "block_kv": geo[1],
                                   "resident": geo[2],
                                   "blocked_tables": geo[3]}}), flush=True)

    if args.only in (None, "resident"):
        run("fused_resident", fused)
    if args.only in (None, "streaming"):
        old = fa.RESIDENT_KV_VMEM_BUDGET
        fa.RESIDENT_KV_VMEM_BUDGET = 0
        try:
            run("fused_streaming", fused)
        finally:
            fa.RESIDENT_KV_VMEM_BUDGET = old
    if args.only == "int8" or (args.int8 and args.only is None):
        run("fused_resident_int8_score", fused_i8)
        a = fa.fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                        num_heads=N, impl="pallas")
        b = fused_i8(q, k, v, cos, sin, gq, gk)
        print(json.dumps({
            "metric": "int8_score_parity",
            "max_abs_diff": float(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            "ref_max": float(jnp.abs(a.astype(jnp.float32)).max()),
        }), flush=True)
    if args.only in (None, "unfused"):
        run("unfused_ref(separate passes incl. rope/rms)", unfused)


if __name__ == "__main__":
    main()
