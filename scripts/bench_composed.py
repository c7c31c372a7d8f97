"""Composed best-known operating point (VERDICT r3 #2).

Every acceleration gate was chip-measured in ISOLATION in round 3 (W8A8
static -10%, fitted TeaCache 1.575x, cfg-skip 1.13x); the <=60 s north-star
extrapolation implicitly multiplies them. This script measures them
TOGETHER in one 30-step 1.3B GeoAdapter generation on the chip:

  1. bf16, no gates            -> t_bf16        (the reference point)
  2. W8A8 static-calibrated    -> t_w8a8        (quantization alone)
  3. + fitted TeaCache + cfg-skip 0.25 -> t_composed (+ steps skipped)

All walls are latent-drained (host read) — axon dispatch is async and
block_until_ready can return early. Reference knobs being composed:
fp8 weights versecrafter_inference.py:288-301, TeaCache :306-313,
cfg_skip decorator (wan_transformer3d.py:850-871).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_composed.py
       [--steps 30 --cfg_skip 0.25 --skip_frac 0.4 | --tiny]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cfg_skip", type=float, default=0.25)
    ap.add_argument("--skip_frac", type=float, default=0.4)
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke on CPU at toy scale")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from versecrafter_tpu.sampling import teacache as tc
    from versecrafter_tpu.serve.model_server import default_pipeline_factory

    pipe = default_pipeline_factory(scale="tiny" if args.tiny else "1.3b")()
    if args.tiny:
        args.height = args.width = 64
        args.frames, args.steps = 9, 6
        import versecrafter_tpu.utils.quantize as _q
        _q.MIN_SIZE = 1 << 10

    kw = dict(control_videos=[np.random.default_rng(i).random(
        (1, 3, args.frames, args.height, args.width)).astype(np.float32)
        for i in range(4)],
        height=args.height, width=args.width, num_frames=args.frames,
        num_inference_steps=args.steps, guidance_scale=5.0, shift=16.0,
        seed=2025)
    warm_kw = dict(kw, num_inference_steps=2)

    def run_drained(**kwargs):
        lat = pipe("a cinematic scene", output_type="latent", **kwargs)
        float(jnp.abs(lat).astype(jnp.float32).sum())

    def timed(tag, **kwargs):
        run_drained(**warm_kw)  # separate compiled program per gate combo
        t0 = time.perf_counter()
        run_drained(**kwargs)
        dt = time.perf_counter() - t0
        print(json.dumps({"stage": tag, "wall_s": round(dt, 1)}), flush=True)
        return dt

    # ---- 1. bf16, no gates ------------------------------------------------
    pipe.disable_teacache()
    pipe.enable_cfg_skip(0.0)
    t_bf16 = timed("bf16_no_gates", **kw)

    # ---- 2. W8A8 static calibration + quantize ---------------------------
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.utils import quantize as qz

    cfg = pipe.dit_cfg
    f_lat = (args.frames - 1) // pipe.vae_cfg.temporal_compression_ratio + 1
    h_lat = args.height // pipe.vae_cfg.spatial_compression_ratio
    w_lat = args.width // pipe.vae_cfg.spatial_compression_ratio
    grid = (f_lat, h_lat // 2, w_lat // 2)
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)
    ks = jax.random.split(jax.random.key(3), 3)
    xc = jax.random.normal(
        ks[0], (2, cfg.in_dim, f_lat, h_lat, w_lat), jnp.bfloat16)
    cc = jax.random.normal(ks[1], (2, cfg.text_len, cfg.text_dim),
                           jnp.bfloat16)
    gc = jax.random.normal(
        ks[2], (2, cfg.resolved_geoada_in_dim, f_lat, h_lat, w_lat),
        jnp.bfloat16)
    _, stats = jax.jit(lambda p, x, t, c, g: wan_dit.wan_dit_forward(
        p, cfg, x, t, c, cos, sin, geoada_context=g, calibrate=True))(
            pipe.dit_params, xc, jnp.full((2,), 500.0, jnp.float32), cc, gc)
    scales = qz.fit_act_scales([jax.device_get(stats)])
    pipe.quantize_weights(int8_compute=True, act_scales=scales)
    t_w8a8 = timed("w8a8_static_no_gates", **kw)

    # ---- 3. fit TeaCache ON THE QUANTIZED MODEL, then compose -------------
    rel_e0, rel_res = pipe.record_teacache_stats("a cinematic scene", **kw)
    coeffs = tc.fit_teacache_coefficients(rel_e0, rel_res, degree=4)
    pred = np.polyval(coeffs, rel_e0)
    run_len = max(1, round(1.0 / max(args.skip_frac, 1e-3)) - 1)
    thresh = float(np.median(pred) * (run_len + 0.5))
    pipe.enable_teacache(max(thresh, 1e-6),
                         skip_start=3 if args.tiny else 5,
                         coefficients=coeffs)
    pipe.enable_cfg_skip(args.cfg_skip)
    pipe.teacache_debug = True
    run_drained(**warm_kw)
    pipe.teacache_accum_history = []
    t0 = time.perf_counter()
    run_drained(**kw)
    t_comp = time.perf_counter() - t0
    accums = pipe.teacache_accum_history
    skipped = sum(1 for a in accums if (np.asarray(a) != 0).all())

    print(json.dumps({
        "metric": "composed_operating_point_1.3b_geoada",
        "config": {"w8a8": "static", "teacache_threshold": round(thresh, 4),
                   "cfg_skip": args.cfg_skip, "steps": args.steps,
                   "shape": f"{args.height}x{args.width}x{args.frames}"},
        "wall_s_bf16": round(t_bf16, 1),
        "wall_s_w8a8": round(t_w8a8, 1),
        "wall_s_composed": round(t_comp, 1),
        "steps_skipped": int(skipped),
        "speedup_quant": round(t_bf16 / max(t_w8a8, 1e-9), 3),
        "speedup_total": round(t_bf16 / max(t_comp, 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
