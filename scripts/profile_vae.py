"""Profile the streaming VAE decode/encode at the bench operating point.

Decode measures 9.3 s at 480p x 81f (round 1) against a rough ~1-2 s
compute bound — this sweeps the temporal chunk size (latent frames per
jitted steady-chunk program) to see how much is per-chunk overhead vs conv
compute, and times encode for reference. Guides VAE tuning; not a driver
metric.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_vae.py
"""

import json
import time

import jax


def main():
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import VAEConfig
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.models import vae_stream

    cfg = VAEConfig()
    params = jax.jit(lambda k: init_vae(k, cfg, jnp.bfloat16))(jax.random.key(0))

    lat = jax.random.normal(jax.random.key(1), (1, cfg.z_dim, 21, 60, 104),
                            jnp.bfloat16)
    vid = jax.random.normal(jax.random.key(2), (1, 3, 81, 480, 832),
                            jnp.bfloat16)

    def timed(tag, fn, *args, n=3):
        out = fn(*args)
        _ = float(jnp.abs(out.astype(jnp.float32)).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.abs(out.astype(jnp.float32)).sum())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"config": tag, "ms": round(ms, 1)}))
        return ms

    for chunk in (1, 2, 4):
        timed(f"decode_latent_chunk{chunk}",
              lambda p, c, z, ch=chunk: vae_stream.vae_decode_chunked(
                  p, c, z, latent_chunk=ch), params, cfg, lat)
    for chunk in (4, 8, 16):
        timed(f"encode_frame_chunk{chunk}",
              lambda p, c, x, ch=chunk: vae_stream.vae_encode_chunked(
                  p, c, x, frame_chunk=ch), params, cfg, vid)


if __name__ == "__main__":
    main()
