"""TeaCache end to end: record -> fit -> FIRE (VERDICT r2 missing #3).

The reference ships hardcoded rescale-polynomial coefficients fit offline to
real-weight trajectories (versecrafter_inference.py:306); with random init
weights that polynomial never crosses the threshold, so the accelerator was
dormant. This script runs the full method on whatever weights are loaded:

1. record one full (never-skipping) generation, collecting per-step
   (rel-L1 of e0 drift, rel-L1 of blocks-residual drift) pairs
   (VerseCrafterPipeline.record_teacache_stats);
2. fit the degree-4 rescale polynomial (tc.fit_teacache_coefficients);
3. re-run WITH TeaCache enabled at a threshold calibrated from the fitted
   trajectory so a target fraction of steps skip, and report measured wall
   times + which steps actually skipped (accum > 0 after a step).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_teacache.py
       [--height 480 --width 832 --frames 81 --steps 30 --skip_frac 0.4]
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
    ap.add_argument("--skip_frac", type=float, default=0.4,
                    help="target fraction of steps to skip")
    ap.add_argument("--model", default=None, help="checkpoint dir (default: "
                    "random-init 1.3B flagship)")
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke on CPU at toy scale")
    ap.add_argument("--out", default=None,
                    help="save the fitted coefficients + threshold as JSON "
                         "(consumable by cli/inference --teacache_coeffs "
                         "and the serving teacache_coefficients param)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np

    from versecrafter_tpu.sampling import teacache as tc

    if args.model:
        from versecrafter_tpu.core.convert import load_versecrafter
        pipe = load_versecrafter(args.model)
    else:
        from versecrafter_tpu.serve.model_server import default_pipeline_factory
        pipe = default_pipeline_factory(
            scale="tiny" if args.tiny else "1.3b")()
    if args.tiny:
        args.height = args.width = 64
        args.frames, args.steps = 9, 6

    kw = dict(control_videos=[np.random.default_rng(i).random(
        (1, 3, args.frames, args.height, args.width)).astype(np.float32)
        for i in range(4)],
        height=args.height, width=args.width, num_frames=args.frames,
        num_inference_steps=args.steps, guidance_scale=5.0, shift=16.0,
        seed=2025)

    print("== recording trajectory (no skipping) ==", flush=True)
    t0 = time.perf_counter()
    rel_e0, rel_res = pipe.record_teacache_stats("a cinematic scene", **kw)
    t_rec = time.perf_counter() - t0
    coeffs = tc.fit_teacache_coefficients(rel_e0, rel_res, degree=4)
    print(json.dumps({"fitted_coefficients": list(coeffs),
                      "record_wall_s": round(t_rec, 1),
                      "rel_e0_range": [float(rel_e0.min()), float(rel_e0.max())],
                      "rel_res_range": [float(rel_res.min()), float(rel_res.max())]}),
          flush=True)

    # calibrate: with accumulation resetting on each calc, a threshold of
    # ~(1/skip_frac_run_length) * mean predicted drift lets runs of
    # consecutive skips form. Aim: skip ~skip_frac of steps.
    pred = np.polyval(coeffs, rel_e0)
    run_len = max(1, round(1.0 / max(args.skip_frac, 1e-3)) - 1)
    thresh = float(np.median(pred) * (run_len + 0.5))
    skip_start = 3 if args.tiny else 5

    # Warm both program variants before timing: the plain and the
    # TeaCache (lax.cond) denoise loops are different compiled programs,
    # and a cold first call folds 1-2 min of XLA compile into the wall time
    # (an earlier run reported speedup 0.146 for exactly this reason). Each
    # run must also end with a HOST READ of the latent: on the axon backend
    # dispatch is asynchronous and block_until_ready can return early, so
    # without it the OFF run "finishes" in dispatch time (11 s) while its
    # ~145 s of device work drains into the ON run's wall clock.
    import jax.numpy as jnp
    warm_kw = dict(kw)
    warm_kw["num_inference_steps"] = 2

    def run_drained(**kwargs):
        lat = pipe("a cinematic scene", output_type="latent", **kwargs)
        float(jnp.abs(lat).astype(jnp.float32).sum())

    print(f"== timed run WITHOUT TeaCache ==", flush=True)
    pipe.disable_teacache()
    run_drained(**warm_kw)
    t0 = time.perf_counter()
    run_drained(**kw)
    t_off = time.perf_counter() - t0

    print(f"== timed run WITH fitted TeaCache (threshold {thresh:.4f}) ==",
          flush=True)
    pipe.enable_teacache(max(thresh, 1e-6), skip_start=skip_start,
                         coefficients=coeffs)
    pipe.teacache_debug = True
    run_drained(**warm_kw)
    pipe.teacache_accum_history = []
    t0 = time.perf_counter()
    run_drained(**kw)
    t_on = time.perf_counter() - t0

    accums = np.stack(pipe.teacache_accum_history)
    # a computed step resets its accumulator to exactly 0.0; a skipped one
    # adds the rescale polynomial (which can be negative at small rel-L1),
    # so nonzero — not positive — marks a skip
    skipped = (accums != 0).all(axis=1)  # all CFG rows skipped -> step skipped
    print(json.dumps({
        "metric": "teacache_e2e",
        "steps": int(accums.shape[0]),
        "steps_skipped": int(skipped.sum()),
        "skipped_step_indices": np.nonzero(skipped)[0].tolist(),
        "wall_s_off": round(t_off, 1),
        "wall_s_on": round(t_on, 1),
        "speedup": round(t_off / max(t_on, 1e-9), 3),
        "threshold": thresh,
    }), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"coefficients": [float(c) for c in coeffs],
                       "threshold": float(thresh)}, f)
        print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
