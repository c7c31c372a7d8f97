"""CLI: GeoAdapter finetuning on a (dp, fsdp, sp, tp) mesh.

The reference ships DeepSpeed ZeRO-2/3 training configs
(/root/reference/config/zero_stage{2,3}*.json) but no training script; this
is the TPU-native training driver on top of
parallel/train_step.py: rectified-flow loss, frozen Wan backbone +
trainable GeoAdapter branch (the reference's training setup — SURVEY §1),
GSPMD param sharding standing in for ZeRO.

Data contract (one directory per clip, the renderer's output layout):
    <clip>/background_RGB.mp4 background_depth.mp4 3D_gaussian_RGB.mp4
           3D_gaussian_depth.mp4 merged_mask.mp4   # control maps (step 5)
    <clip>/video.mp4                               # ground-truth RGB target
    <clip>/prompt.txt                              # text prompt
Latents + prompt embeddings are VAE/T5-encoded once and cached as
<clip>/latent_cache_{H}x{W}x{T}.npz.

`--synthetic N` trains on N random-latent samples instead (smoke / perf
runs without data or VAE/T5 weights).
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GeoAdapter finetuning (TPU)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="Directory of clip dirs (see module docstring)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Train on N synthetic samples instead of data_dir")
    p.add_argument("--output_dir", type=str, default="outputs/train")
    p.add_argument("--model_name", type=str, default=None,
                   help="Converted checkpoint dir (core.convert layout)")
    p.add_argument("--tiny", action="store_true",
                   help="Tiny random-init model (smoke tests)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--sample_size", type=str, default="480,832")
    p.add_argument("--video_length", type=int, default=81)
    p.add_argument("--lora_rank", type=int, default=0,
                   help="> 0: LoRA finetuning — only low-rank factors over "
                        "the block matmuls train (whole base frozen); "
                        "checkpoints also export a torch-naming LoRA sd "
                        "(.npz) that loads via --lora_path / merge_lora")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="LoRA scale numerator (default = rank -> scale 1)")
    p.add_argument("--train_full", action="store_true",
                   help="Train the full model (default: GeoAdapter only)")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--attn_impl", type=str, default="auto")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _encode_clip(pipe, clip_dir: str, h: int, w: int, n: int):
    """VAE/T5-encode one clip -> (x0 latents, geoada context, prompt emb),
    cached next to the clip."""
    import numpy as np

    cache = os.path.join(clip_dir, f"latent_cache_{h}x{w}x{n}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["x0"], z["geo"], z["ctx"]

    import jax.numpy as jnp

    from versecrafter_tpu.utils.video import load_video

    controls = []
    for name in ("background_RGB.mp4", "background_depth.mp4",
                 "3D_gaussian_RGB.mp4", "3D_gaussian_depth.mp4"):
        path = os.path.join(clip_dir, name)
        if os.path.exists(path):
            controls.append(load_video(path, num_frames=n, size=(h, w)))
        elif controls:
            controls.append(np.zeros_like(controls[0]))
    mask_p = os.path.join(clip_dir, "merged_mask.mp4")
    mask = (load_video(mask_p, num_frames=n, size=(h, w))[:, :1]
            if os.path.exists(mask_p)
            else np.ones((1, 1, n, h, w), np.float32))
    geo, _ = pipe.encode_controls(controls, mask)

    target = load_video(os.path.join(clip_dir, "video.mp4"),
                        num_frames=n, size=(h, w))
    x0 = pipe._vae_encode_fn()(jnp.asarray(target) * 2.0 - 1.0)

    prompt_path = os.path.join(clip_dir, "prompt.txt")
    prompt = (open(prompt_path).read().strip()
              if os.path.exists(prompt_path) else "")
    ctx = pipe.encode_prompt(prompt)[1:]  # positive half only

    x0, geo, ctx = (np.asarray(t, np.float32) for t in (x0, geo, ctx))
    np.savez_compressed(cache, x0=x0[0], geo=geo[0], ctx=ctx[0])
    return x0[0], geo[0], ctx[0]


def main(argv=None):
    args = parse_args(argv)
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from versecrafter_tpu.core import checkpoint as ckpt
    from versecrafter_tpu.core.config import WAN21_1_3B, WanDiTConfig
    from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.parallel.sharding import (mesh_context,
                                                    shard_dit_params)
    from versecrafter_tpu.parallel.train_step import (make_lora_train_step,
                                                      make_train_step,
                                                      split_trainable)

    h, w = (int(x) for x in args.sample_size.split(","))
    n_frames = args.video_length

    # -- model ---------------------------------------------------------------
    def _unzero_head(params, cfg, dtype):
        # the reference-faithful zero-init head blocks all upstream gradient;
        # a converted checkpoint has a trained head, random init does not
        params["head"]["head"]["kernel"] = (jax.random.normal(
            jax.random.key(args.seed + 7),
            params["head"]["head"]["kernel"].shape) * 0.02).astype(dtype)
        return params

    if args.tiny:
        cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                           text_dim=48, out_dim=4, num_heads=4, num_layers=4,
                           text_len=16, geoada_layers=(), geoada_in_dim=8)
        params = _unzero_head(
            jax.jit(lambda k: init_wan_dit(k, cfg, jnp.float32))(
                jax.random.key(args.seed)),
            cfg, jnp.float32)
        pipe = None
    elif args.model_name:
        from versecrafter_tpu.core.convert import load_versecrafter

        pipe = load_versecrafter(args.model_name, geoada_in_dim=128)
        cfg, params = pipe.dit_cfg, pipe.dit_params
    else:
        cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(),
                                  geoada_in_dim=128)
        params = _unzero_head(
            jax.jit(lambda k: init_wan_dit(k, cfg, jnp.bfloat16))(
                jax.random.key(args.seed)), cfg, jnp.bfloat16)
        pipe = None

    # -- mesh + sharding -----------------------------------------------------
    spec = MeshSpec(dp=args.dp, fsdp=args.fsdp, sp=args.sp, tp=args.tp)
    use_mesh = spec.size > 1
    mesh = make_mesh(spec) if use_mesh else None
    if use_mesh:
        params = shard_dit_params(params, mesh)
    lora_scale = None
    if args.lora_rank > 0:
        from versecrafter_tpu.utils.lora import init_lora

        lora_scale = (args.lora_alpha or args.lora_rank) / args.lora_rank
        train = init_lora(params, args.lora_rank,
                          jax.random.key(args.seed + 5),
                          groups=("blocks", "geoada_blocks"))
        frozen = params
        mode = f"LoRA rank {args.lora_rank} (scale {lora_scale:g})"
    else:
        train, frozen = split_trainable(params,
                                        geoadapter_only=not args.train_full)
        mode = "full model" if args.train_full else "GeoAdapter only"
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(train))
    print(f"trainable params: {n_train/1e6:.1f}M ({mode})")

    opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = opt.init(train)
    attn = "sp" if (use_mesh and spec.sp > 1) else args.attn_impl
    step_fn = (make_lora_train_step(cfg, opt, lora_scale, attn_impl=attn)
               if args.lora_rank > 0
               else make_train_step(cfg, opt, attn_impl=attn))

    # -- data ----------------------------------------------------------------
    vae_stride = (4, 8, 8) if pipe is None else (
        pipe.vae_cfg.temporal_compression_ratio,
        pipe.vae_cfg.spatial_compression_ratio,
        pipe.vae_cfg.spatial_compression_ratio)
    t_lat = (n_frames - 1) // vae_stride[0] + 1
    h_lat, w_lat = h // vae_stride[1], w // vae_stride[2]
    gin = cfg.resolved_geoada_in_dim

    if args.synthetic or args.data_dir is None:
        n_samples = max(args.synthetic, args.batch_size)
        rng = np.random.default_rng(args.seed)
        data = [(rng.standard_normal((cfg.in_dim, t_lat, h_lat, w_lat)),
                 rng.standard_normal((gin, t_lat, h_lat, w_lat)),
                 rng.standard_normal((cfg.text_len, cfg.text_dim)))
                for _ in range(n_samples)]
        print(f"synthetic dataset: {n_samples} samples "
              f"latents {data[0][0].shape}")
    else:
        if pipe is None:
            raise SystemExit("--data_dir needs --model_name (VAE/T5 weights "
                             "to encode clips); use --synthetic otherwise")
        clips = sorted(d for d in os.listdir(args.data_dir)
                       if os.path.isdir(os.path.join(args.data_dir, d)))
        data = [_encode_clip(pipe, os.path.join(args.data_dir, c), h, w,
                             n_frames) for c in clips]
        print(f"encoded {len(data)} clips from {args.data_dir}")

    pt, ph, pw = cfg.patch_size
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, t_lat // pt, h_lat // ph, w_lat // pw)

    # -- loop ----------------------------------------------------------------
    os.makedirs(args.output_dir, exist_ok=True)
    sampler = np.random.default_rng(args.seed + 1)
    dtype = jnp.bfloat16 if not args.tiny else jnp.float32
    from contextlib import nullcontext
    ctx_mgr = mesh_context(mesh) if use_mesh else nullcontext()
    with ctx_mgr:
        jstep = jax.jit(step_fn, donate_argnums=(0, 2))
        losses = []
        for i in range(args.steps):
            idx = sampler.integers(0, len(data), args.batch_size)
            x0 = jnp.asarray(np.stack([data[j][0] for j in idx]), dtype)
            geo = jnp.asarray(np.stack([data[j][1] for j in idx]), dtype)
            tctx = jnp.asarray(np.stack([data[j][2] for j in idx]), dtype)
            if use_mesh and spec.dp > 1:
                shard = NamedSharding(mesh, P("dp"))
                x0, geo, tctx = (jax.device_put(a, shard)
                                 for a in (x0, geo, tctx))
            train, opt_state, loss = jstep(
                train, frozen, opt_state, jax.random.key(args.seed + 2 + i),
                x0, tctx, cos, sin, geo)
            losses.append(float(loss))
            if (i + 1) % args.log_every == 0 or i == 0:
                avg = sum(losses[-args.log_every:]) / len(losses[-args.log_every:])
                print(f"step {i + 1}/{args.steps} loss {avg:.4f}", flush=True)
            if (i + 1) % args.save_every == 0 or i + 1 == args.steps:
                path = os.path.join(args.output_dir, f"step_{i + 1:06d}")
                ckpt.save_checkpoint(path, {"params": train})
                if args.lora_rank > 0:
                    # torch-naming safetensors export: loads anywhere the
                    # reference's LoRA format does (CLI --lora_path /
                    # merge_lora)
                    from safetensors.numpy import save_file

                    from versecrafter_tpu.utils.lora import lora_to_torch_sd
                    save_file(lora_to_torch_sd(train),
                              path + "_lora.safetensors")
                print(f"saved {path}", flush=True)
    print(f"final loss {losses[-1]:.4f}")
    return losses


if __name__ == "__main__":
    main()
