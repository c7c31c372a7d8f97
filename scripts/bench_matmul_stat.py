"""Microbench: q/k projection + row-RMS statistic, three ways, at the
production shapes (D=1536, rows = CFG-2 x tokens).

  xla_dot        — jnp.dot + bias only (lower bound: the matmul alone)
  xla_dot_stat   — jnp.dot + bias + standalone XLA statistic pass (the
                   production path PROJ_STAT_FUSION replaces; the stat adds
                   ~2 ms at 65,520 rows — the ~100 GB/s wall)
  pallas_fused   — kernels/matmul_stat.linear_rstat (epilogue statistic)

The fused kernel wins iff pallas_fused < xla_dot_stat; the (pallas_fused -
xla_dot) gap is the price of the Pallas matmul vs XLA's.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_matmul_stat.py
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*",
                    default=[65520, 151200, 32760],
                    help="row counts (2x32,760 = 480p81f CFG-2; 2x75,600 = "
                         "720p; 32,760 = CFG-1 — exercises the 8-multiple "
                         "block fallback)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from versecrafter_tpu.kernels.matmul_stat import linear_rstat

    D = 1536
    ks = jax.random.split(jax.random.key(0), 3)
    w = 0.02 * jax.random.normal(ks[0], (D, D), jnp.bfloat16)
    b = 0.02 * jax.random.normal(ks[1], (D,), jnp.bfloat16)
    p = {"kernel": w, "bias": b}

    def timed(fn, *a):
        out = fn(*a)
        _ = float(sum(jnp.abs(o).astype(jnp.float32).sum()
                      for o in (out if isinstance(out, tuple) else (out,))))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _ = float(sum(jnp.abs(o).astype(jnp.float32).sum()
                      for o in (out if isinstance(out, tuple) else (out,))))
        return (time.perf_counter() - t0) / args.iters * 1e3

    for rows in args.rows:
        x = jax.random.normal(ks[2], (1, rows, D), jnp.bfloat16)

        xla_dot = jax.jit(lambda x: jnp.dot(x, w.astype(x.dtype)) + b)

        @jax.jit
        def xla_dot_stat(x):
            y = jnp.dot(x, w.astype(x.dtype)) + b
            yf = y.astype(jnp.float32)
            return y, jax.lax.rsqrt(
                jnp.mean(yf * yf, -1, keepdims=True) + 1e-6)

        fused = jax.jit(lambda x: linear_rstat(p, x))

        ms_dot = timed(xla_dot, x)
        ms_stat = timed(xla_dot_stat, x)
        ms_fused = timed(fused, x)
        tf = 2 * rows * D * D / 1e12
        print(json.dumps({
            "metric": "matmul_stat_ms", "rows": rows,
            "xla_dot": round(ms_dot, 3),
            "xla_dot_stat": round(ms_stat, 3),
            "pallas_fused": round(ms_fused, 3),
            "fused_tfs": round(tf / (ms_fused / 1e3), 1),
            "win_vs_dot_stat_ms": round(ms_stat - ms_fused, 3),
        }), flush=True)

        y1, r1 = xla_dot_stat(x)
        y2, r2 = fused(x)
        print(json.dumps({
            "metric": "matmul_stat_parity", "rows": rows,
            "y_max_abs_diff": float(jnp.abs(
                y1.astype(jnp.float32) - y2.astype(jnp.float32)).max()),
            "rs_max_abs_diff": float(jnp.abs(r1 - r2).max()),
        }), flush=True)


if __name__ == "__main__":
    main()
