"""CLI: controlled video generation (step 6, the canonical generate path).

Flag-compatible with /root/reference/inference/versecrafter_inference.py
(parser at :44-69; operating knobs :74-177): consumes the control-map
directory produced by render_maps and writes generated_video_N.mp4.

TPU-native: no torchrun — parallelism comes from --sp/--tp mesh axes (the
reference's --ulysses_degree/--ring_degree map to sp; their product picks
the sp size so existing invocations keep working).
"""

from __future__ import annotations

import argparse


NEGATIVE_PROMPT = (
    "Bright tones, overexposed, static, blurred details, subtitles, style, "
    "works, paintings, images, static, overall gray, worst quality, low "
    "quality, JPEG compression residue, ugly, incomplete, extra fingers, "
    "poorly drawn hands, poorly drawn faces, deformed, disfigured, misshapen "
    "limbs, fused fingers, still picture, messy background, three legs, many "
    "people in the background, walking backwards"
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Video generation inference (TPU)")
    p.add_argument("--transformer_path", type=str, default=None)
    p.add_argument("--model_name", type=str, default=None,
                   help="Base model dir (Wan2.1-T2V-14B layout)")
    p.add_argument("--save_path", type=str, default="outputs/inference")
    p.add_argument("--rendering_maps_path", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--input_image_path", type=str, required=True)
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--sample_size", type=str, default=None)
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--ring_degree", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=2025)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--video_length", type=int, default=None)
    p.add_argument("--sampler", type=str, default="Flow_Unipc",
                   choices=["Flow", "Flow_Unipc", "Flow_DPM++"])
    p.add_argument("--shift", type=float, default=16.0)
    p.add_argument("--teacache_threshold", type=float, default=0.10)
    p.add_argument("--teacache_skip_start", type=int, default=5)
    p.add_argument("--teacache_coeffs", type=str, default=None,
                   help="JSON file with fitted rescale-polynomial "
                        "coefficients (scripts/fit_teacache.py --out); "
                        "the file's fitted threshold takes precedence over "
                        "--teacache_threshold")
    p.add_argument("--cfg_skip_ratio", type=float, default=0.0)
    p.add_argument("--enable_riflex", action="store_true")
    p.add_argument("--riflex_k", type=int, default=6)
    p.add_argument("--geoada_context_scale", type=float, default=1.0)
    p.add_argument("--geoada_in_dim", type=int, default=128)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--lora_weight", type=float, default=0.55)
    p.add_argument("--quantize_int8", action="store_true")
    p.add_argument("--int8_compute", action="store_true",
                   help="with --quantize_int8 (implied): run block matmuls "
                        "as W8A8 int8 MXU dots (~2x bf16 throughput)")
    p.add_argument("--int8_attention", action="store_true",
                   help="int8 QK^T scoring inside the fused attention "
                        "kernel (~2x bf16 MXU rate; inference-only "
                        "approximation, per-row scales)")
    p.add_argument("--quantize_bits", type=int, default=8, choices=(8, 4),
                   help="with --quantize_int8: weight storage width; 4 = "
                        "nibble-packed (half the HBM, group-wise scales); "
                        "with --int8_compute this is the W4A8 mode "
                        "(per-channel int4 feeding the s8 MXU dots)")
    p.add_argument("--auto_parallel", action="store_true",
                   help="shard over ALL visible devices (auto (sp,tp) "
                        "factorization, reference model_server.py:149-191)")
    p.add_argument("--offline_smoke", action="store_true",
                   help="random-init model, tiny shapes (no weights env)")
    p.add_argument("--smoke_scale", type=str, default="1.3b",
                   choices=["1.3b", "tiny", "14b"],
                   help="offline_smoke model size (tiny: wiring checks on "
                        "slow backends, e.g. the virtual CPU mesh; 14b: the "
                        "real flagship shapes — use with --staged)")
    p.add_argument("--staged", action="store_true",
                   help="staged weight residency: T5 -> encode -> free, "
                        "VAE -> encode -> free, quantized DiT -> denoise "
                        "-> free, VAE -> decode. Sequential (batch-1) CFG. "
                        "The single-16GB-chip path for the 14B flagship")
    p.add_argument("--moe", action="store_true",
                   help="Wan2.2 two-expert timestep MoE "
                        "(transformer_combination_type 'moe', "
                        "config/wan2.2/wan_civitai_t2v.yaml:3-8). With "
                        "--staged only ONE expert is ever resident: the "
                        "experts are time-sequential during denoising, so "
                        "each is built at the sigma-boundary crossing")
    p.add_argument("--moe_boundary", type=float, default=0.875,
                   help="sigma >= boundary selects the high-noise expert")
    p.add_argument("--transformer_high_path", type=str, default=None,
                   help="high-noise expert checkpoint dir (Wan2.2)")
    p.add_argument("--cfg_parallel", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="with --staged: batch the CFG pair into one forward "
                        "(on) or run two batch-1 passes (off). auto picks "
                        "batched whenever the chip-calibrated memory model "
                        "says the batch-2 step fits one v5e "
                        "(sampling.staged.auto_cfg_parallel) — batched at "
                        "480p x 81f, sequential at 720p where CFG-2 "
                        "provably overflows 16 GB")
    p.add_argument("--fit_teacache", nargs="?", const="", default=None,
                   metavar="OUT_JSON",
                   help="with --staged: record a full trajectory first, "
                        "fit TeaCache coefficients (record -> fit -> fire "
                        "in one command), then generate with them; "
                        "optionally save the fit as OUT_JSON")
    return p.parse_args(argv)


def _main_staged(args, h, w):
    """Staged-residency generation (--staged): the single-16GB-chip path
    for the 14B flagship — T5, VAE and the quantized DiT are resident one
    at a time (sampling/staged.py), CFG runs sequentially (batch-1).
    Covers the reference's canonical 14B generate
    (versecrafter_inference.py:180-261 -> pipeline:650-948) on hardware
    that cannot co-host umT5-xxl + the DiT."""
    import json as _json

    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline
    from versecrafter_tpu.sampling.staged import (
        checkpoint_factories, fresh_init_factories, generate_staged)
    from versecrafter_tpu.serve.model_server import (
        load_request_inputs, save_generated_video)

    bits = (args.quantize_bits
            if (args.quantize_int8 or args.int8_compute) else 0)
    if args.model_name:
        factories, dit_cfg, vae_cfg, t5_cfg = checkpoint_factories(
            args.model_name, transformer_path=args.transformer_path,
            geoada_in_dim=args.geoada_in_dim, bits=bits,
            int8_compute=args.int8_compute)
    else:
        factories, dit_cfg, vae_cfg, t5_cfg = fresh_init_factories(
            scale=args.smoke_scale, bits=bits,
            int8_compute=args.int8_compute)

    high_dit = None
    if args.moe:
        # second (high-noise) expert: same architecture, its own weights —
        # a different checkpoint dir, or a different seed for fresh-init
        if args.model_name:
            fh, *_ = checkpoint_factories(
                args.model_name,
                transformer_path=(args.transformer_high_path
                                  or args.transformer_path),
                geoada_in_dim=args.geoada_in_dim, bits=bits,
                int8_compute=args.int8_compute)
        else:
            fh, *_ = fresh_init_factories(
                scale=args.smoke_scale, bits=bits,
                int8_compute=args.int8_compute, seed=1)
        high_dit = fh.dit

    from versecrafter_tpu.sampling.staged import (
        auto_cfg_parallel, estimate_denoise_gb)

    t_lat = (args.video_length - 1) // vae_cfg.temporal_compression_ratio + 1
    tokens = (t_lat * (h // vae_cfg.spatial_compression_ratio
                       // dit_cfg.patch_size[1])
              * (w // vae_cfg.spatial_compression_ratio
                 // dit_cfg.patch_size[2]))
    if args.cfg_parallel == "auto":
        cfg_par = auto_cfg_parallel(dit_cfg, bits, tokens)
    else:
        cfg_par = args.cfg_parallel == "on"
    print(_json.dumps({
        "cfg_parallel": cfg_par, "tokens": tokens,
        "est_step_gb": round(estimate_denoise_gb(
            dit_cfg, bits, tokens, 2 if cfg_par else 1), 2)}), flush=True)

    pipe = VerseCrafterPipeline(
        dit_params=None, dit_cfg=dit_cfg, vae_params=None, vae_cfg=vae_cfg,
        t5_params=None, t5_cfg=t5_cfg,
        scheduler_name={"Flow": "euler", "Flow_Unipc": "unipc",
                        "Flow_DPM++": "dpm++"}[args.sampler],
        cfg_parallel=cfg_par)
    if args.teacache_coeffs:
        with open(args.teacache_coeffs) as f:
            fit = _json.load(f)
        pipe.enable_teacache(
            float(fit.get("threshold", args.teacache_threshold)),
            args.teacache_skip_start, coefficients=tuple(fit["coefficients"]))
    elif args.teacache_threshold > 0 and args.fit_teacache is None:
        pipe.enable_teacache(args.teacache_threshold, args.teacache_skip_start)
    if args.cfg_skip_ratio > 0:
        pipe.enable_cfg_skip(args.cfg_skip_ratio)
    if args.int8_attention:
        pipe.enable_int8_attention()
    if args.moe:
        import time as _time

        def expert_swap(which, _lo=factories.dit, _hi=high_dit):
            t0 = _time.perf_counter()
            params = (_hi if which == "high" else _lo)()
            print(_json.dumps({"expert_build": which,
                               "s": round(_time.perf_counter() - t0, 1)}),
                  flush=True)
            return params

        pipe.expert_swap = expert_swap
        pipe.moe_boundary = args.moe_boundary

    controls, mask = load_request_inputs({
        "rendering_maps_path": args.rendering_maps_path,
        "input_image_path": args.input_image_path,
        "height": h, "width": w, "num_frames": args.video_length,
        "fps": args.fps})

    def progress(i, n):
        print(f"denoise {i} / {n}", flush=True)

    if args.fit_teacache is not None and not args.teacache_coeffs:
        # record -> fit -> fire, staged (the TeaCache method for models too
        # large to stay resident; reference recipe versecrafter_inference.py
        # :306-313 with the polynomial fit run HERE instead of shipped)
        import numpy as np

        from versecrafter_tpu.sampling import teacache as tc

        rel_e0, rel_res = generate_staged(
            pipe, factories, args.prompt, NEGATIVE_PROMPT,
            control_videos=controls, mask_video=mask,
            height=h, width=w, num_frames=args.video_length,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, shift=args.shift,
            seed=args.seed, record_teacache=True, progress=progress)
        coeffs = tc.fit_teacache_coefficients(rel_e0, rel_res, degree=4)
        pred = np.polyval(coeffs, rel_e0)
        thresh = float(np.median(pred) * 1.5)  # ~40% skip target
        pipe.enable_teacache(max(thresh, 1e-6), args.teacache_skip_start,
                             coefficients=coeffs)
        fit = {"coefficients": [float(c) for c in coeffs],
               "threshold": thresh}
        print(_json.dumps({"teacache_fit": fit,
                           "record_profile_s": pipe.last_stage_profile}),
              flush=True)
        if args.fit_teacache:
            with open(args.fit_teacache, "w") as f:
                _json.dump(fit, f)
        # the record trajectory is itself a full ungated generation —
        # decode its latents into the first output video instead of
        # discarding ~half the run's denoise work
        lat = getattr(pipe, "last_record_latents", None)
        if lat is not None:
            import time as _time
            t0 = _time.perf_counter()
            pipe.vae_params = factories.vae()
            rec_video = pipe.decode_latents(lat, "uint8")
            pipe.vae_params = None
            pipe.last_record_latents = None
            out0 = save_generated_video(
                rec_video, {"save_path": args.save_path, "fps": args.fps})
            print(_json.dumps({
                "record_video": out0,
                "record_decode_s": round(_time.perf_counter() - t0, 1)}),
                flush=True)

    video = generate_staged(
        pipe, factories, args.prompt, NEGATIVE_PROMPT,
        control_videos=controls, mask_video=mask,
        height=h, width=w, num_frames=args.video_length,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, shift=args.shift,
        seed=args.seed, geoada_context_scale=args.geoada_context_scale,
        progress=progress)
    out = save_generated_video(
        video, {"save_path": args.save_path, "fps": args.fps})
    print(_json.dumps({"staged_profile_s": pipe.last_stage_profile}),
          flush=True)
    print(args.prompt)
    print(out)
    return out


def main(argv=None):
    args = parse_args(argv)
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from versecrafter_tpu.core.mesh import spec_from_degrees
    from versecrafter_tpu.serve.model_server import (
        default_pipeline_factory, resolve_mesh, run_generate_request,
        save_generated_video)

    # offline_smoke defaults to tiny shapes but explicit size flags win, so
    # a full-scale run on random weights (perf measurement without
    # checkpoints in the image) stays reachable
    smoke_defaults = (64, 64, 9, 4) if args.offline_smoke else (720, 1280, 81, 50)
    h, w = ((int(x) for x in args.sample_size.split(","))
            if args.sample_size else smoke_defaults[:2])
    if args.video_length is None:
        args.video_length = smoke_defaults[2]
    if args.num_inference_steps is None:
        args.num_inference_steps = smoke_defaults[3]

    if args.staged:
        return _main_staged(args, h, w)

    # the reference's torchrun --ulysses_degree x --ring_degree becomes one
    # sp mesh axis; --tp composes (versecrafter_inference.py:271-281)
    spec = spec_from_degrees(args.ulysses_degree, args.ring_degree, args.tp)

    import time as _time
    _t_build = _time.perf_counter()
    if args.model_name:
        from versecrafter_tpu.core.convert import load_versecrafter

        pipe = load_versecrafter(
            args.model_name, transformer_path=args.transformer_path,
            geoada_in_dim=args.geoada_in_dim,
            scheduler={"Flow": "euler", "Flow_Unipc": "unipc",
                       "Flow_DPM++": "dpm++"}[args.sampler])
        pipe.set_mesh(resolve_mesh(spec if spec.size > 1 else None,
                                   args.auto_parallel,
                                   pipe.dit_cfg.num_heads))
    else:
        pipe = default_pipeline_factory(
            mesh_spec=spec if spec.size > 1 else None,
            auto_mesh=args.auto_parallel, scale=args.smoke_scale)()

    _t_build = _time.perf_counter() - _t_build

    if args.teacache_coeffs:
        import json as _json
        with open(args.teacache_coeffs) as f:
            fit = _json.load(f)
        thresh = float(fit.get("threshold", args.teacache_threshold))
        pipe.enable_teacache(thresh, args.teacache_skip_start,
                             coefficients=tuple(fit["coefficients"]))
    elif args.teacache_threshold > 0:
        pipe.enable_teacache(args.teacache_threshold, args.teacache_skip_start)
    if args.cfg_skip_ratio > 0:
        pipe.enable_cfg_skip(args.cfg_skip_ratio)
    if args.enable_riflex:
        lat_frames = (args.video_length - 1) // pipe.vae_cfg.temporal_compression_ratio + 1
        pipe.enable_riflex(k=args.riflex_k, L_test=lat_frames)
    if args.lora_path:
        from versecrafter_tpu.core.convert import load_torch_state_dict
        pipe.merge_lora(load_torch_state_dict(args.lora_path), args.lora_weight)
    if args.quantize_int8 or args.int8_compute:
        pipe.quantize_weights(int8_compute=args.int8_compute,
                              bits=args.quantize_bits)
    if args.int8_attention:
        pipe.enable_int8_attention()

    def progress(i, n):
        print(f"denoise {i} / {n}", flush=True)

    video = run_generate_request(pipe, {
        "rendering_maps_path": args.rendering_maps_path,
        "input_image_path": args.input_image_path,
        "prompt": args.prompt,
        "negative_prompt": NEGATIVE_PROMPT,
        "height": h, "width": w, "num_frames": args.video_length,
        "num_inference_steps": args.num_inference_steps,
        "guidance_scale": args.guidance_scale, "shift": args.shift,
        "seed": args.seed, "fps": args.fps,
        "save_path": args.save_path,
    }, progress)
    out = save_generated_video(
        video, {"save_path": args.save_path, "fps": args.fps})
    prof = getattr(pipe, "last_wall_profile", None)
    if prof:
        # phase WALL split (host+device+tunnel) — on the axon tunnel the
        # 19 MB/s download makes wall diverge from device time; this
        # attributes the generate stage honestly in pipeline walls
        import json as _json
        prof = dict(prof, model_build=round(_t_build, 2))
        print(_json.dumps({"generate_wall_profile_s": prof}), flush=True)
    print(args.prompt)
    print(out)


if __name__ == "__main__":
    main()
