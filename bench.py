"""Benchmark: flagship denoise-step latency on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the CFG-batched (batch 2) GeoAdapter DiT forward — the inner hot
loop of generation (SURVEY.md §3.1) — at the reference's canonical 480p x 81f
operating point (75,600 video tokens) on however many TPU chips are
attached, using the largest flagship that fits (Wan2.1-1.3B+GeoAdapter on a
single v5e; 14B when a multi-chip mesh is available).

vs_baseline: measured_ms / north-star per-step budget. BASELINE.json's
north star is 60 s end-to-end for 81f@480p in 30 UniPC steps on v5p-8 ->
2000 ms per CFG-batched denoise step. Values < 1.0 beat the budget.
"""

import json
import time


def main():
    import jax

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B
    import dataclasses

    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward

    cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(), geoada_in_dim=128)
    dev = jax.devices()[0]

    # canonical 480p x 81f: latents [21, 60, 104] -> grid (21, 30, 52) ->
    # 32,760... reference 480p is 480x832 -> (21,30,52) = 32,760 tokens;
    # the README's "480p" demo uses 480x832. 75,600 corresponds to 720x1280
    # scaled; we bench 480x832 here (pipeline seq formula pipeline:861-865).
    f_lat, h_lat, w_lat = 21, 60, 104
    grid = (f_lat, h_lat // 2, w_lat // 2)
    seq = grid[0] * grid[1] * grid[2]

    params = jax.jit(lambda k: init_wan_dit(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)

    B = 2  # CFG batch (cond + uncond), pipeline:878
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_dim, f_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (B, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    geo = jax.random.normal(ks[2], (B, 128, f_lat, h_lat, w_lat), jnp.bfloat16)

    fwd = jax.jit(lambda p, x, t, c, g: wan_dit_forward(
        p, cfg, x, t, c, cos, sin, geoada_context=g))

    try:
        out = fwd(params, x, t, ctx, geo)
        # axon tunnel: block_until_ready can return early — a host read is
        # the only reliable sync (CLAUDE.md gotchas)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())  # compile + warmup
    except Exception as e:  # pragma: no cover - chip-compile safety net
        # A default-on kernel that has only ever compiled in interpret mode
        # (e.g. the matmul_stat projection epilogue) failing under Mosaic
        # must degrade the bench to the proven configuration, not kill it.
        from versecrafter_tpu.models import wan_dit as _wd
        print(json.dumps({"metric": "bench_fallback",
                          "disabled": "PROJ_STAT_FUSION",
                          "error": str(e)[:200]}), flush=True)
        _wd.PROJ_STAT_FUSION = False
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x, t, ctx, geo)
    _ = float(jnp.abs(out).astype(jnp.float32).sum())
    ms = (time.perf_counter() - t0) / n * 1e3

    render = _render_device_fps()

    print(json.dumps({
        "metric": f"denoise_step_ms_wan1.3b_geoada_480p81f_seq{seq}_cfg2",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(ms / 2000.0, 4),
        # control-map render device fps (BASELINE.json "control-map render
        # fps"): device-time frames/s of the full render path (splat +
        # raycast + EWA + composite + finalize) at 480p on synthetic
        # geometry; the wall additionally includes the worker-thread
        # downloads, which overlap device work (geometry/render.py)
        **{f"render_{k}": v for k, v in render.items()},
    }))


def _render_device_fps(n_points=500_000, n_frames=54, n_objects=4):
    """Device-time control-map render fps at 480p (synthetic geometry —
    same programs as the demo render: sort-splat, analytic ellipsoid
    raycast, EWA projection, compositing, uint8 finalize)."""
    import jax
    import numpy as np

    from versecrafter_tpu.geometry import render as R

    rng = np.random.default_rng(0)
    pts = rng.uniform([-2, -2, 2], [2, 2, 8],
                      (n_points, 3)).astype(np.float32)
    cols = rng.uniform(0, 255, (n_points, 3)).astype(np.float32)
    K = np.array([[600.0, 0, 416], [0, 600.0, 240], [0, 0, 1]], np.float32)
    w2cs = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    w2cs[:, 0, 3] = np.linspace(0, 0.5, n_frames)  # slow truck
    means = rng.uniform([-1, -1, 3], [1, 1, 6],
                        (n_frames, n_objects, 3)).astype(np.float32)
    a = rng.standard_normal((n_objects, 3, 3)).astype(np.float32) * 0.1
    covs = np.einsum("oij,okj->oik", a, a) + 0.02 * np.eye(3, dtype=np.float32)
    covs = np.tile(covs, (n_frames, 1, 1, 1))
    present = np.ones((n_frames, n_objects), bool)
    obj_colors = rng.uniform(0, 1, (n_objects, 3)).astype(np.float32)

    try:
        R.render_control_maps(pts, cols, K, w2cs, means, covs, present,
                              obj_colors, (480, 832), frame_batch=27)
        prof = dict(R.last_render_profile)
        return {"device_fps": prof.get("device_fps"),
                "device_s": prof.get("device_s"),
                "wall_s": prof.get("wall_s"),
                "frames": prof.get("frames")}
    except Exception as e:  # pragma: no cover — bench must never die here
        return {"device_fps": None, "error": str(e)[:200]}


if __name__ == "__main__":
    main()
