"""Where does the denoise step spend its time? Ablation profile on real TPU.

Times the CFG-batched 1.3B GeoAdapter forward at the bench operating point
(480x832x81f, 32,760 tokens), then re-times with self-attention stubbed to
identity (difference = time in the attention kernel + its layout plumbing),
and sweeps flash-attention block shapes. Guides kernel tuning; not a driver
metric (bench.py is).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step_ablation.py
"""

import dataclasses
import json
import time


def main():
    import jax

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit

    cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(), geoada_in_dim=128)
    f_lat, h_lat, w_lat = 21, 60, 104
    grid = (f_lat, h_lat // 2, w_lat // 2)

    params = jax.jit(lambda k: wan_dit.init_wan_dit(k, cfg, dtype=jnp.bfloat16))(
        jax.random.key(0))
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, *grid)
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (2, cfg.in_dim, f_lat, h_lat, w_lat), jnp.bfloat16)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(ks[1], (2, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    geo = jax.random.normal(ks[2], (2, 128, f_lat, h_lat, w_lat), jnp.bfloat16)

    def timed(tag, n=5):
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).sum())  # axon: block_until_ready returns early
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, x, t, ctx, geo)
        _ = float(jnp.abs(out).sum())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"config": tag, "step_ms": round(ms, 1)}))
        return ms

    full = timed("full_step")

    # stub attention: out = q (keeps projections/rope, drops the kernels —
    # covers self- and the small 512-token cross-attention)
    real = wan_dit.flash_attention
    wan_dit.flash_attention = lambda q, k, v, **kw: q
    no_attn = timed("attention_stubbed")
    wan_dit.flash_attention = real

    print(json.dumps({"config": "attention_share",
                      "attn_ms": round(full - no_attn, 1),
                      "attn_frac": round((full - no_attn) / full, 3)}))

    # block-shape sweep on the raw kernel at the bench sequence length
    B, N, S, D = 2, 12, 32760, 128
    q = jax.random.normal(jax.random.key(2), (B, N, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(3), (B, N, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(4), (B, N, S, D), jnp.bfloat16)
    for bq, bkv in [(512, 1024), (1024, 512), (1024, 1024), (2048, 512),
                    (512, 2048), (1024, 2048)]:
        try:
            fn = jax.jit(lambda q, k, v: real(q, k, v, impl="pallas",
                                              block_q=bq, block_kv=bkv))
            o = fn(q, k, v); _ = float(o.astype(jnp.float32).sum())
            t0 = time.perf_counter()
            for _ in range(5):
                o = fn(q, k, v)
            _ = float(o.astype(jnp.float32).sum())
            ms = (time.perf_counter() - t0) / 5 * 1e3
            tf = 4 * B * N * S * S * D / (ms / 1e3) / 1e12
            print(json.dumps({"config": f"kernel_bq{bq}_bkv{bkv}",
                              "ms": round(ms, 1), "tf_s": round(tf, 1)}))
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"config": f"kernel_bq{bq}_bkv{bkv}",
                              "error": str(e)[:100]}))


if __name__ == "__main__":
    main()
