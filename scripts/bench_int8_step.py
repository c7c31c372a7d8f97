"""Step-level W8A8 ablation on the 1.3B flagship (real chip).

Measures the CFG-batched GeoAdapter denoise step (same operating point as
bench.py: 480p x 81f, 32,760 tokens) in four weight modes:
  bf16 / int8 weight-only storage / W8A8 dynamic / W8A8 static-calibrated
and reports per-mode step ms plus output deviation vs bf16 on a fixed
input. The static mode calibrates activation scales with one
wan_dit_forward(calibrate=True) pass at the bench shape
(utils.quantize.fit_act_scales).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_step.py [--res 480]
"""

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=480, choices=(480, 720))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke at toy scale on CPU")
    ap.add_argument("--combo", action="store_true",
                    help="measure only bf16 ref + the combined fast preset "
                         "(W8A8 static + INT8_QK_SCORE) — the stacked-"
                         "acceleration step number")
    ap.add_argument("--per_tensor", action="store_true",
                    help="use per-tensor dynamic activation scales instead "
                         "of the default per-row (ROW_ACT_SCALES) mode")
    ap.add_argument("--sites", type=str, default=None,
                    help="comma-separated substring filter over the W8A8 "
                         "compute sites (e.g. 'ffn' = FFN-only W8A8 — the "
                         "shape-aware policy); measures bf16 ref + the "
                         "filtered dynamic mode only")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B, WanDiTConfig
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward
    from versecrafter_tpu.utils import quantize as qz

    cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(), geoada_in_dim=128)
    f_lat, h_lat, w_lat = (21, 60, 104) if args.res == 480 else (21, 90, 160)
    if args.tiny:
        cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                           text_dim=32, out_dim=4, num_heads=2, num_layers=2,
                           text_len=16, geoada_layers=(0,), geoada_in_dim=8)
        qz.MIN_SIZE = 1 << 10
        f_lat, h_lat, w_lat = 2, 8, 8
    grid = (f_lat, h_lat // 2, w_lat // 2)
    seq = grid[0] * grid[1] * grid[2]

    params = jax.jit(lambda k: init_wan_dit(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    # the production head is ZERO-INIT -> fresh-init outputs are constant
    # and any parity diff is a vacuous 0.0 (CLAUDE.md lesson); randomize it
    params["head"]["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.key(42), params["head"]["head"]["kernel"].shape,
        jnp.bfloat16)
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)
    B = 2
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_dim, f_lat, h_lat, w_lat),
                          jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    geo = jax.random.normal(
        ks[2], (B, cfg.resolved_geoada_in_dim, f_lat, h_lat, w_lat),
        jnp.bfloat16)

    def measure(p, tag, ref=None):
      try:
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(p, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(p, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        rec = {"metric": f"step_ms_1p3b_geoada_{args.res}p_{tag}",
               "value": round(ms, 1), "unit": "ms", "seq": seq}
        if ref is not None:
            d = jnp.abs(out.astype(jnp.float32) - ref)
            rec["max_abs_diff_vs_bf16"] = round(float(d.max()), 5)
            rec["rel_fro_vs_bf16"] = round(
                float(jnp.linalg.norm(d) / jnp.linalg.norm(ref)), 5)
        print(json.dumps(rec), flush=True)
        return out.astype(jnp.float32) if ref is None else ref
      except Exception as e:  # noqa: BLE001 — unattended queue run
        print(json.dumps({"metric": f"step_ms_1p3b_geoada_{args.res}p_{tag}",
                          "error": str(e)[:300]}), flush=True)
        return ref

    if args.per_tensor:
        qz.ROW_ACT_SCALES = False
    mode_tag = "_pt" if args.per_tensor else ""

    ref = measure(params, "bf16")

    q = qz.quantize_tree(params)
    if args.sites:
        toks = tuple(args.sites.split(","))
        qsel = qz.tag_int8_compute(q, sites=toks)
        measure(qsel, "w8a8_dyn_" + "_".join(toks), ref)
        return
    if not args.combo:
        measure(q, "int8_storage", ref)

        qdyn = qz.tag_int8_compute(q)
        measure(qdyn, "w8a8_dynamic" + mode_tag, ref)

    _, stats = jax.jit(
        lambda p, x, t, c, g: wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g, calibrate=True)
    )(q, x, t, ctx, geo)
    scales = qz.fit_act_scales([stats])
    qstat = qz.tag_int8_compute(q, act_scales=scales)
    if not args.combo:
        measure(qstat, "w8a8_static", ref)
    else:
        # Stacked fast preset: static W8A8 block matmuls + int8 QK^T
        # scoring inside the fused attention kernel. The two modes touch
        # disjoint dots (projections/FFN vs score), so wins should add.
        from versecrafter_tpu.models import wan_dit
        prev = wan_dit.INT8_QK_SCORE
        wan_dit.INT8_QK_SCORE = True
        try:
            measure(qstat, "w8a8s_int8attn", ref)
        finally:
            wan_dit.INT8_QK_SCORE = prev


if __name__ == "__main__":
    main()
