"""14B DiT denoise step ON REAL SILICON (VERDICT r2 missing #1).

Builds Wan2.1-14B (40 layers, dim 5120 — config of the reference flagship,
/root/reference/config/wan2.1/wan_civitai.yaml:9-26) directly in int8 on the
single v5e: blocks are initialized ONE AT A TIME (bf16 transient ~0.7 GB),
quantized on device, and written into preallocated int8 stacks with donated
buffers, so peak HBM stays ~weights(int8)+1 block. The denoise step then
dequantizes PER LAYER inside the scan (models/wan_dit.py) — HBM holds int8.

Measures the CFG-batched step at shapes that fit beside ~14 GB of weights
and prints one JSON line per configuration, plus the extrapolation to the
bench operating point (480p x 81f, 32,760 tokens) for COVERAGE.md. The
GeoAdapter variant (+20 adapter blocks ~= +7B params) exceeds single-chip
HBM even in int8; its cost is 1.5x the base blocks' (45 vs 30 attention
layers at 1.3B scale), which the extrapolation row applies.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_14b.py
"""

import argparse
import dataclasses
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke at toy scale on CPU")
    ap.add_argument("--int8_compute", action="store_true",
                    help="tag block matmuls for W8A8 int8 MXU compute "
                         "(utils.quantize.tag_int8_compute) instead of "
                         "weight-only storage")
    ap.add_argument("--calibrate", action="store_true",
                    help="with --int8_compute: fit static activation "
                         "scales from one calibrate forward at the bench "
                         "shape (vs dynamic per-tensor absmax)")
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4),
                    help="weight storage width; 4 = nibble-packed "
                         "(~7.5 GB weights) which frees enough HBM to "
                         "MEASURE the full canonical 480p x 81f point "
                         "(32,760 tok) instead of extrapolating to it; "
                         "with --int8_compute this is the W4A8 mode "
                         "(int4 weights + s8 MXU dots)")
    ap.add_argument("--res720", action="store_true",
                    help="additionally attempt the reference's canonical "
                         "720p x 81f shape (720x1280 -> latents "
                         "[21,90,160] -> 75,600 tokens, seq formula "
                         "pipeline_wan_versecrafter.py:861-865) — CFG-1 "
                         "first (comparable activation rows to the "
                         "measured CFG-2 480p point), then CFG-2; OOMs "
                         "report as JSON error lines, not crashes")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import WAN21_14B
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.utils import quantize as qz

    cfg = dataclasses.replace(WAN21_14B, geoada_layers=None)
    if args.tiny:
        from versecrafter_tpu.core.config import WanDiTConfig
        cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                           text_dim=32, out_dim=4, num_heads=2, num_layers=3,
                           text_len=16, geoada_layers=None)
        import versecrafter_tpu.utils.quantize as _q
        _q.MIN_SIZE = 1 << 10
    L = cfg.num_layers

    # ---- build the int8 model incrementally -----------------------------
    t0 = time.time()
    # bits=4 + int8_compute = W4A8: per-channel int4 (the group scales
    # can't fold into the s8 dot epilogue), unpacked to s8 in-graph
    gs = 0 if (args.bits == 4 and args.int8_compute) else None
    init_one = jax.jit(lambda k: wan_dit._init_block(k, cfg, jnp.bfloat16))
    quant_one = jax.jit(lambda p: qz.quantize_tree(p, bits=args.bits,
                                                   group_size=gs))

    blk0 = quant_one(init_one(jax.random.key(0)))
    stacked = jax.tree.map(lambda a: jnp.zeros((L, *a.shape), a.dtype), blk0)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write(st, blk, i):
        return jax.tree.map(
            lambda s, b: jax.lax.dynamic_update_index_in_dim(s, b, i, 0),
            st, blk)

    for i in range(L):
        stacked = write(stacked, quant_one(init_one(jax.random.key(i))), i)
    jax.block_until_ready(jax.tree.leaves(stacked)[0])

    # small non-block params in bf16 (init via one jit program)
    def small(k):
        p = wan_dit.init_wan_dit(
            k, dataclasses.replace(cfg, num_layers=1), jnp.bfloat16)
        p.pop("blocks")
        return p

    params = jax.jit(small)(jax.random.key(7))
    params["blocks"] = stacked

    angles0 = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    if args.int8_compute:
        scales = None
        if args.calibrate:
            # one calibrate forward on the storage-mode tree at the first
            # bench shape -> static per-layer activation scales
            f_lat, h_lat, w_lat = (2, 8, 8) if args.tiny else (6, 60, 104)
            grid0 = (f_lat, h_lat // 2, w_lat // 2)
            cos0, sin0 = grid_cos_sin(angles0, *grid0)
            kc = jax.random.split(jax.random.key(3), 2)
            xc = jax.random.normal(
                kc[0], (2, cfg.in_dim, f_lat, h_lat, w_lat), jnp.bfloat16)
            cc = jax.random.normal(
                kc[1], (2, cfg.text_len, cfg.text_dim), jnp.bfloat16)
            _, stats = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
                p, cfg, x, t, c, cos0, sin0, calibrate=True))(
                    params, xc, jnp.full((2,), 500.0, jnp.float32), cc)
            scales = qz.fit_act_scales([stats])
        params = qz.tag_int8_compute(params, act_scales=scales)
    wbytes = qz.tree_bytes(params)
    if args.int8_compute:
        mode = "w4a8" if args.bits == 4 else (
            "w8a8s" if args.calibrate else "w8a8")
    else:
        mode = "int4" if args.bits == 4 else "int8"
    print(json.dumps({"metric": f"14b_{mode}_weight_bytes", "value": wbytes,
                      "build_s": round(time.time() - t0, 1)}), flush=True)

    angles = angles0

    def step_ms(f_lat, h_lat, w_lat, B, iters=3):
        grid = (f_lat, h_lat // 2, w_lat // 2)
        seq = grid[0] * grid[1] * grid[2]
        cos, sin = grid_cos_sin(angles, *grid)
        ks = jax.random.split(jax.random.key(1), 2)
        x = jax.random.normal(ks[0], (B, cfg.in_dim, f_lat, h_lat, w_lat),
                              jnp.bfloat16)
        t = jnp.full((B,), 500.0, jnp.float32)
        ctx = jax.random.normal(ks[1], (B, cfg.text_len, cfg.text_dim),
                                jnp.bfloat16)

        def fwd_fn(p, x, t, c):
            p = {k: (v if k == "blocks" else qz.dequantize_tree(v))
                 for k, v in p.items()}
            return wan_dit.wan_dit_forward(p, cfg, x, t, c, cos, sin)

        fwd = jax.jit(fwd_fn)
        out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x, t, ctx)
        _ = float(jnp.abs(out).astype(jnp.float32).sum())
        return (time.perf_counter() - t0) / iters * 1e3, seq

    # 480p x 21f: the largest canonical-width shape that fits beside int8
    # weights single-chip (attention seq 9,360). int4 weights (~7.5 GB)
    # free enough HBM for the FULL canonical 480p x 81f point — measure it
    # directly (CFG-1 first: fits comfortably; CFG-2 is the real operating
    # point and is attempted after).
    shapes = [
        (6, 60, 104, 2, "480p21f_cfg2"),
        (6, 60, 104, 1, "480p21f_cfg1"),
    ]
    if args.bits == 4:
        shapes = [
            (21, 60, 104, 1, "480p81f_cfg1"),
            (21, 60, 104, 2, "480p81f_cfg2"),
        ] + shapes
    if args.res720:
        shapes = shapes + [
            (21, 90, 160, 1, "720p81f_cfg1"),
            (21, 90, 160, 2, "720p81f_cfg2"),
        ]
    if args.tiny:
        shapes = [(2, 8, 8, 2, "tiny_cfg2")]
    for (f_lat, h, w, B, tag) in shapes:
        try:
            ms, seq = step_ms(f_lat, h, w, B)
            print(json.dumps({
                "metric": f"denoise_step_ms_wan14b_{mode}_{tag}_seq{seq}",
                "value": round(ms, 1), "unit": "ms", "seq": seq, "cfg_batch": B,
            }), flush=True)
            if tag == "480p21f_cfg2":
                # extrapolate to 32,760 tokens: attention scales ~quadratic
                # (75% of step at 1.3B; at 14B FFN share grows), matmuls
                # linear. Conservative split: attn 60% quad, rest linear.
                r = 32760 / seq
                est = ms * (0.60 * r * r + 0.40 * r)
                print(json.dumps({
                    "metric": f"EXTRAPOLATED_step_ms_wan14b_{mode}_480p81f",
                    "value": round(est, 1), "unit": "ms",
                    "note": "measured 14B step scaled to 32,760 tok "
                            "(60% quadratic attn / 40% linear): the "
                            "single-chip anchor for COVERAGE.md's "
                            "multi-chip projection",
                }), flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM etc.
            print(json.dumps({"metric": tag, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
