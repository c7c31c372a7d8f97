"""Acceleration operating points on real TPU: the full 30-step denoise loop
(1.3B GeoAdapter flagship, 480x832x81f, CFG) under

  1. baseline                     (every step: CFG-batched forward)
  2. TeaCache 0.10                (the reference's canonical threshold,
                                   versecrafter_inference.py:104-118)
  3. TeaCache 0.10 + cfg-skip 0.25 (uncond branch dropped for the last 25%
                                   of steps, videox_fun cfg_skip semantics)

bench.py stays the single-step driver metric; this script quantifies the
end-to-end denoise-loop effect of the acceleration toggles. NOTE: with
random weights the TeaCache skip trajectory is indicative, not identical to
the real checkpoint's (the rescaled-distance poly saw trained embeddings).

Usage: python scripts/bench_operating_points.py [--steps 30]
"""

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--frames", type=int, default=81)
    args = ap.parse_args()

    import jax

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import (T5Config, VAEConfig, WAN21_1_3B)
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    dit_cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(),
                                  geoada_in_dim=128)
    t5_cfg = T5Config(dim=dit_cfg.text_dim, dim_attn=512, dim_ffn=1024,
                      num_heads=8, num_layers=2, vocab=1024)
    vae_cfg = VAEConfig()

    dit_params = jax.jit(
        lambda k: init_wan_dit(k, dit_cfg, dtype=jnp.bfloat16))(
            jax.random.key(0))
    t5_params = init_t5(jax.random.key(1), t5_cfg, dtype=jnp.bfloat16)

    t_lat = (args.frames - 1) // vae_cfg.temporal_compression_ratio + 1
    h_lat = args.height // vae_cfg.spatial_compression_ratio
    w_lat = args.width // vae_cfg.spatial_compression_ratio
    geo = jax.random.normal(jax.random.key(2),
                            (1, 128, t_lat, h_lat, w_lat), jnp.bfloat16)

    pipe = VerseCrafterPipeline(
        dit_params=dit_params, dit_cfg=dit_cfg, vae_params=None,
        vae_cfg=vae_cfg, t5_params=t5_params, t5_cfg=t5_cfg)

    def run(tag):
        # warm/compile pass: 4 steps hits both the cfg-batched and (when
        # cfg-skip is on, skip_from=3) the cond-only compiled variants
        warm = pipe(prompt="a car driving", geoada_context=geo,
                    height=args.height, width=args.width,
                    num_frames=args.frames,
                    num_inference_steps=4, output_type="latent")
        _ = float(jnp.abs(warm).sum())  # axon: block_until_ready returns early
        t0 = time.perf_counter()
        lat = pipe(prompt="a car driving", geoada_context=geo,
                   height=args.height, width=args.width,
                   num_frames=args.frames,
                   num_inference_steps=args.steps, output_type="latent")
        _ = float(jnp.abs(lat).sum())  # force host read = real sync
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": tag, "steps": args.steps,
            "denoise_loop_s": round(dt, 2),
            "avg_step_ms": round(dt / args.steps * 1e3, 1)}))
        return dt

    base = run("baseline")

    pipe.enable_teacache(0.10)  # canonical threshold (reference :104-118)
    tea = run("teacache_0.10")

    pipe.enable_cfg_skip(0.25)
    both = run("teacache_0.10+cfg_skip_0.25")

    print(json.dumps({
        "config": "summary",
        "teacache_speedup": round(base / tea, 3),
        "teacache_cfgskip_speedup": round(base / both, 3)}))


if __name__ == "__main__":
    main()
