"""Is the fused-self regression about geoada STRUCTURE or program SCALE?

Arithmetic from the round-3 measurements: geoada (45 blocks) scales exactly
1.5x over plain (30 blocks) on the unfused path, but shows ~+400 ms excess
over 1.5x-scaling when the fused self-attention kernel is on. This probe
runs a PLAIN model (no geoadapter at all) at num_layers in {30, 45}, fused
vs unfused, on the real chip. If L=45-plain fused also loses vs scaling,
the anomaly is program-scale (XLA scheduling / HBM residency), not the
geoada scan structure.

Round-3 result (v5e, streaming fused kernel):

    L=30  unfused 3759.6  fused 3554.8  (delta -204.8)
    L=45  unfused 5623.5  fused 5322.1  (delta -301.4)

-> perfect 1.5x scaling of the win; the regression is geoada-structural.
Device traces (scripts/trace_fused_geoada.py + analyze_xplane.py) then
pinned it: the IDENTICAL fused custom-call runs 82.6 ms/call inside the
plain program but 90.2-92.8 ms/call inside geoada programs (unfused kernel:
79.1 in both), while the per-block XLA-side savings (~9.5 ms) are the same
— so fused lost ~1.6 ms/block net in geoada. The kernel's context
sensitivity tracks its strided flat-layout K/V re-streaming (7x redundant
at 32,760 tokens); the resident-KV kernel mode removes it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fused_scale.py
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

    f_lat, h_lat, w_lat = 21, 60, 104
    grid = (f_lat, h_lat // 2, w_lat // 2)

    def bench(num_layers, fused, iters=4):
        cfg = dataclasses.replace(WAN21_1_3B, num_layers=num_layers,
                                  geoada_layers=None)
        params = jax.jit(lambda k: wan_dit.init_wan_dit(k, cfg, jnp.bfloat16))(
            jax.random.key(0))
        angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
        cos, sin = grid_cos_sin(angles, *grid)
        ks = jax.random.split(jax.random.key(1), 2)
        x = jax.random.normal(ks[0], (2, cfg.in_dim, f_lat, h_lat, w_lat),
                              jnp.bfloat16)
        t = jnp.full((2,), 500.0, jnp.float32)
        ctx = jax.random.normal(ks[1], (2, cfg.text_len, cfg.text_dim),
                                jnp.bfloat16)
        wan_dit.FUSED_QK_ATTENTION = fused
        fwd = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin))
        out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"layers": num_layers, "fused": fused,
                          "step_ms": round(ms, 1)}), flush=True)
        return ms

    for L in (30, 45):
        u = bench(L, False)
        f = bench(L, True)
        print(json.dumps({"layers": L, "delta_ms": round(f - u, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
