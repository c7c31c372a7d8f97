"""Capture jax.profiler device traces of the geoada step, fused vs unfused.

The VMEM-cap sweep (scripts/probe_fused_geoada.py) showed the geoada fused
self-attention regression is insensitive to the kernel's scoped-VMEM limit,
so the +70-110 ms must be visible as op-level time somewhere in the trace.
Writes traces under /tmp/geoada_trace/{unfused,fused}; aggregate with
scripts/analyze_xplane.py, eyeball concurrency with scripts/xplane_timeline.py.

Round-3 findings from these traces (2 steps each, per-call times):

  unfused kernel (_flash_attention_pallas, [B,N,S,D]):   79.1 ms/call
  fused kernel inside the PLAIN program:                 82.6 ms/call
  fused kernel inside GEOADA programs:              90.2-92.8 ms/call
  unfused per-block rope/rms/relayout XLA tail:          ~16.5 ms/block
  fused per-block XLA tail (rstat reduces + pads):        ~7.0 ms/block

-> per block: unfused 95.6 ms vs fused-in-geoada 97.2 ms (+1.6 x 45 = the
observed +72 ms), vs fused-in-plain 89.6 (-6 x 30 = the observed -205 ms).
The SAME custom-call binary is ~8 ms slower inside geoada programs; nothing
overlaps it in the timeline except small async copies, pointing at its
strided flat-layout K/V re-streaming (7x redundant) as the context-
sensitive part — which the kernel's resident-KV mode eliminates.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_fused_geoada.py
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
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (2, cfg.in_dim, f_lat, h_lat, w_lat),
                          jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (2, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    geo = jax.random.normal(ks[2], (2, 128, f_lat, h_lat, w_lat),
                            jnp.bfloat16)

    def trace(tag, fused):
        wan_dit.FUSED_QK_ATTENTION = True
        wan_dit.GEOADA_FUSED_QK = fused
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(params, x, t, ctx, geo)  # compile
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        out_dir = f"/tmp/geoada_trace/{tag}"
        jax.profiler.start_trace(out_dir)
        for _ in range(2):
            out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        jax.profiler.stop_trace()
        print(json.dumps({"trace": tag, "dir": out_dir}), flush=True)

    trace("unfused", False)
    trace("fused", True)


if __name__ == "__main__":
    main()
