"""Probe the geoada fused-self-attention regression (round-3 record).

Round-3 combo matrix (scripts/bench_fused_ablation.py + stacked-hints probe)
showed the fused qk-RMS+RoPE kernel loses +70-110 ms/step inside GeoAdapter
programs under EVERY scan structure (interleaved superstep, stacked two-scan)
while winning -205 ms in the plain model. This probe swept the kernel's
scoped-VMEM cap and block_q on the real chip (temporary knobs, since
removed) — ALL IRRELEVANT:

    unfused_self(baseline)        5651.6 ms
    fused vmem=110 bq=auto(4680)  5718.3
    fused vmem=96  bq=auto        5725.2
    fused vmem=80  bq=auto        5726.5
    fused vmem=64  bq=auto        5760.6
    fused vmem=48  bq=auto        5723.1
    fused vmem=110 bq=2340        5729.1
    fused vmem=64  bq=2340        5727.7
    fused vmem=110 bq=3276        5717.9

So the regression is insensitive to the fused kernel's scoped-VMEM limit
and q-block geometry. See scripts/probe_fused_scale.py for the next
discriminator (program scale vs geoada structure). Re-running this file
now just reproduces the fused-vs-unfused A/B at the default geometry.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fused_geoada.py
"""

import dataclasses
import json
import time


def main():
    import jax

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit

    cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(), geoada_in_dim=128)
    f_lat, h_lat, w_lat = 21, 60, 104
    grid = (f_lat, h_lat // 2, w_lat // 2)

    params = jax.jit(lambda k: wan_dit.init_wan_dit(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)
    B = 2
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_dim, f_lat, h_lat, w_lat),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    geo = jax.random.normal(ks[2], (B, 128, f_lat, h_lat, w_lat),
                            jnp.bfloat16)

    def run(tag, iters=4):
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"config": tag, "step_ms": round(ms, 1)}),
              flush=True)
        return ms

    # geoada now fuses BY DEFAULT when the resident-KV kernel mode is
    # available (wan_dit.geo_fuse), so the unfused baseline needs the master
    # switch off (a geoada program has no plain blocks — equivalent).
    wan_dit.FUSED_QK_ATTENTION = False
    run("unfused_self(baseline)")
    wan_dit.FUSED_QK_ATTENTION = True
    run("fused_self(resident)")


if __name__ == "__main__":
    main()
