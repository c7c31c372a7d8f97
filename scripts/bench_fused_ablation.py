"""Fused qk-RMSNorm+RoPE attention: step-level ablation on the real chip.

The VERDICT r2 #2 ablation row: measures the full 1.3B denoise step at the
480p x 81f operating point (32,760 tokens, CFG batch 2) with the fused
kernel OFF vs ON, for both the plain Wan backbone and the GeoAdapter
flagship, plus a numerical-parity check of the two paths. Round-3 measured
results (v5e):

    plain   unfused 3818.8 ms  ->  fused(streaming) 3613.7   (-205 ms)
    geoada  unfused 5668.3 ms  ->  fused(streaming) +70-110 REGRESSION
            (trace-diagnosed: scripts/trace_fused_geoada.py)
            ->  fused(RESIDENT-KV) 5225.5            (-443 ms, -7.8%)

The resident-KV kernel mode (V resident per (b,h), K rotated once) is what
makes geoada programs win; it is auto-selected by the dispatch wherever it
fits VMEM, so both models now default to fused self-attention at 480p.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_ablation.py
       [--geoada] [--iters 5]
"""

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geoada", action="store_true",
                    help="bench the GeoAdapter flagship instead of the plain "
                         "backbone")
    ap.add_argument("--cross", action="store_true",
                    help="ablate FUSED_CROSS_ATTENTION (norm-only cross-attn "
                         "kernel) instead of the self-attn rope+rms fusion")
    ap.add_argument("--int8_attn", action="store_true",
                    help="ablate INT8_QK_SCORE (s8 x s8 -> s32 QK^T inside "
                         "the fused kernel, ~2x bf16 MXU rate; the "
                         "max_abs_diff row doubles as the chip-scale "
                         "accuracy envelope)")
    ap.add_argument("--proj_stat", action="store_true",
                    help="ablate PROJ_STAT_FUSION (row-RMS statistics "
                         "emitted by the q/k projection matmul epilogues "
                         "instead of standalone ~100 GB/s reduce passes)")
    ap.add_argument("--streaming", action="store_true",
                    help="fused arm uses the STREAMING kernel flavor "
                         "(resident-KV disabled) — plain-720p a/b")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--res", type=int, default=480, choices=(480, 720),
                    help="operating point: 480 -> 32,760 tok (832x480x81f), "
                         "720 -> 75,600 tok (1280x720x81f)")
    args = ap.parse_args()

    import jax

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit

    cfg = dataclasses.replace(
        WAN21_1_3B,
        geoada_layers=() if args.geoada else None,
        geoada_in_dim=128)
    f_lat, h_lat, w_lat = (21, 60, 104) if args.res == 480 else (21, 90, 160)
    grid = (f_lat, h_lat // 2, w_lat // 2)
    seq = grid[0] * grid[1] * grid[2]

    params = jax.jit(lambda k: wan_dit.init_wan_dit(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    # the head is zero-init (reference parity) -> a fresh-init forward is
    # CONSTANT and the fused-vs-unfused max_abs_diff below would be
    # vacuously 0. Randomize it so the parity number actually probes the
    # attention path.
    hk = params["head"]["head"]["kernel"]
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(9), hk.shape) * 0.02
    ).astype(hk.dtype)
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)
    B = 2
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_dim, f_lat, h_lat, w_lat),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    geo = (jax.random.normal(ks[2], (B, 128, f_lat, h_lat, w_lat),
                             jnp.bfloat16) if args.geoada else None)

    def run(tag):
        fwd = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=geo))
        out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())  # axon: host read
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"metric": f"step_ms_{tag}", "value": round(ms, 1),
                          "seq": seq, "model": "geoada" if args.geoada
                          else "plain"}), flush=True)
        return out, ms

    if args.int8_attn:
        # everything else at PRODUCTION defaults (incl. the geoada
        # fuse-only-where-resident rule — if a config doesn't fuse, both
        # arms legitimately measure no win)
        wan_dit.INT8_QK_SCORE = False
        out_u, ms_u = run("bf16_score")
        wan_dit.INT8_QK_SCORE = True
        out_f, ms_f = run("int8_score")
        wan_dit.INT8_QK_SCORE = False
    elif args.proj_stat:
        # everything else at production defaults; toggle only the
        # producer-fused statistics
        wan_dit.PROJ_STAT_FUSION = False
        out_u, ms_u = run("separate_stat")
        wan_dit.PROJ_STAT_FUSION = True
        out_f, ms_f = run("proj_stat")
    elif args.cross:
        # self-attn fusion at its production default; toggle only cross
        wan_dit.FUSED_CROSS_ATTENTION = False
        out_u, ms_u = run("unfused_cross")
        wan_dit.FUSED_CROSS_ATTENTION = True
        out_f, ms_f = run("fused_cross")
    else:
        wan_dit.FUSED_QK_ATTENTION = False
        out_u, ms_u = run("unfused")
        wan_dit.FUSED_QK_ATTENTION = True
        wan_dit.GEOADA_FUSED_QK = True
        wan_dit.PLAIN_FUSED_AT_BLOCKED = True  # a/b even where prod gates off
        if args.streaming:
            # force the kernel's STREAMING flavor (resident mode disabled):
            # answers whether plain-720p should stream-fuse rather than run
            # unfused, since the resident flavor measured +699 ms there
            import versecrafter_tpu.kernels.flash_attention as fa
            fa.RESIDENT_KV_VMEM_BUDGET = 0
        out_f, ms_f = run("fused_streaming" if args.streaming else "fused")
    err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                - out_u.astype(jnp.float32))))
    print(json.dumps({"metric": "fused_vs_unfused",
                      "delta_ms": round(ms_f - ms_u, 1),
                      "max_abs_diff": err}), flush=True)


if __name__ == "__main__":
    main()
