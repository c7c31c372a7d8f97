"""Bucketized profile of the non-attention tail of the denoise step.

Ablates one component at a time from the CFG-batched 1.3B GeoAdapter forward
at the bench operating point (480x832x81f, 32,760 tokens) and reports the
time attributable to each bucket: self-attention kernel, cross-attention
kernel, RoPE application, qk rms-norms, layer-norm+modulation math, FFN
matmuls, qkv/o projections. Also measures the 720p (75,600-token) step.
Guides tail optimization (VERDICT round-1 item #3); not a driver metric.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_tail_buckets.py
"""

import dataclasses
import json
import time

import jax


def main():
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_1_3B
    from versecrafter_tpu.kernels import norms as norms_mod
    from versecrafter_tpu.kernels import rope as rope_mod
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit

    cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(), geoada_in_dim=128)

    def operating_point(f_lat, h_lat, w_lat):
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
        return params, (x, t, ctx, geo), cos, sin

    def timed(tag, params, args, cos, sin, n=5):
        fwd = jax.jit(lambda p, x, t, c, g: wan_dit.wan_dit_forward(
            p, cfg, x, t, c, cos, sin, geoada_context=g))
        out = fwd(params, *args)
        _ = float(jnp.abs(out).sum())  # axon: block_until_ready returns early
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, *args)
        _ = float(jnp.abs(out).sum())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"config": tag, "step_ms": round(ms, 1)}))
        return ms

    params, args, cos, sin = operating_point(21, 60, 104)
    seq = 21 * 30 * 52

    full = timed(f"full_step_seq{seq}", params, args, cos, sin)

    # --- ablations: each stubs ONE bucket to (near-)identity ---------------
    real_fa = wan_dit.flash_attention
    real_rope = wan_dit.apply_rope
    real_rms = wan_dit.rms_norm
    real_ln = wan_dit.layer_norm
    buckets = {}

    def ablate(tag, setup, teardown):
        setup()
        try:
            ms = timed(f"ablate_{tag}", params, args, cos, sin)
        finally:
            teardown()
        buckets[tag] = full - ms

    # self+cross attention kernels (out = q keeps shapes; drops the kernels).
    # With fusion default-on the self-attn path goes through
    # fused_rope_rms_attention and cross through fused_rms_cross_attention —
    # stub all three entry points or the bucket silently measures ~0.
    real_fused = wan_dit.fused_rope_rms_attention
    real_fused_x = wan_dit.fused_rms_cross_attention

    def _stub_kernels():
        wan_dit.flash_attention = lambda q, k, v, **kw: q
        wan_dit.fused_rope_rms_attention = lambda q, k, v, *a, **kw: q
        wan_dit.fused_rms_cross_attention = lambda q, k, v, *a, **kw: q

    def _unstub_kernels():
        wan_dit.flash_attention = real_fa
        wan_dit.fused_rope_rms_attention = real_fused
        wan_dit.fused_rms_cross_attention = real_fused_x
    ablate("attn_kernels", _stub_kernels, _unstub_kernels)

    # cross-attention kernel only (self stays real)
    def fa_no_cross(q, k, v, **kw):
        if k.shape[2] != q.shape[2]:
            return q
        return real_fa(q, k, v, **kw)
    ablate("cross_attn_kernel",
           lambda: (setattr(wan_dit, "flash_attention", fa_no_cross),
                    setattr(wan_dit, "fused_rms_cross_attention",
                            lambda q, k, v, *a, **kw: q)),
           lambda: (setattr(wan_dit, "flash_attention", real_fa),
                    setattr(wan_dit, "fused_rms_cross_attention",
                            real_fused_x)))

    # RoPE application (table build is outside the jit)
    ablate("rope_apply",
           lambda: setattr(wan_dit, "apply_rope", lambda x, c, s: x),
           lambda: setattr(wan_dit, "apply_rope", real_rope))

    # qk rms norms
    ablate("qk_rms_norm",
           lambda: setattr(wan_dit, "rms_norm", lambda x, sc, eps=1e-6: x),
           lambda: setattr(wan_dit, "rms_norm", real_rms))

    # layer norms (pre-attn/pre-ffn/norm3) — modulation math stays
    ablate("layer_norms",
           lambda: setattr(wan_dit, "layer_norm", lambda x, *a, **kw: x),
           lambda: setattr(wan_dit, "layer_norm", real_ln))

    # FFN matmuls
    real_block = wan_dit.wan_block_forward
    orig_linear = wan_dit._linear

    def linear_skip_ffn(p, x):
        k = p["kernel"]
        if k.ndim == 2 and (k.shape[0] == cfg.ffn_dim or k.shape[1] == cfg.ffn_dim):
            if k.shape[0] == cfg.ffn_dim:   # ffn_out: project back cheaply
                return jnp.zeros((*x.shape[:-1], k.shape[1]), x.dtype)
            return jnp.zeros((*x.shape[:-1], k.shape[1]), x.dtype)
        return orig_linear(p, x)
    ablate("ffn_matmuls",
           lambda: setattr(wan_dit, "_linear", linear_skip_ffn),
           lambda: setattr(wan_dit, "_linear", orig_linear))

    # qkv/o projections (dim x dim kernels inside attention param trees only
    # can't be distinguished by shape from text/time embeds of same dim — so
    # stub attention fns entirely and subtract the kernel-only ablation)
    def self_attn_noproj(p, x, cos, sin, num_heads, qk_norm, eps, attn_impl,
                         window_size=(-1, -1), **kw):
        return x
    def cross_attn_noproj(p, x, context, num_heads, qk_norm, eps, attn_impl,
                          context_img=None, **kw):
        return x
    real_self, real_cross = wan_dit._self_attention, wan_dit._cross_attention

    def _set_noproj():
        wan_dit._self_attention = self_attn_noproj
        wan_dit._cross_attention = cross_attn_noproj

    def _unset_noproj():
        wan_dit._self_attention = real_self
        wan_dit._cross_attention = real_cross
    ablate("attention_total", _set_noproj, _unset_noproj)

    buckets["qkvo_projections"] = (
        buckets["attention_total"] - buckets["attn_kernels"]
        - buckets["rope_apply"] - buckets["qk_rms_norm"])
    tail = full - buckets["attn_kernels"]
    print(json.dumps({"config": "buckets_ms",
                      **{k: round(v, 1) for k, v in buckets.items()},
                      "non_attention_tail": round(tail, 1)}))

    # --- 720p operating point ----------------------------------------------
    params, args, cos, sin = operating_point(21, 90, 160)
    timed("full_step_seq75600_720p", params, args, cos, sin, n=3)


if __name__ == "__main__":
    main()
