"""Staged weight residency: full-pipeline generation on one chip whose HBM
cannot hold every component at once.

The 14B operating point on a single 16 GB v5e: umT5-xxl is ~11 GB bf16, the
W4A8 GeoAdapter DiT ~11 GB, the VAE ~1 GB — they cannot coexist. The
reference runs the same shape by spreading components over 8 GPUs
(versecrafter_inference.py:180-261 load -> pipeline_wan_versecrafter.py
:650-948 call); the single-chip TPU equivalent is STAGED residency, which
exploits the pipeline's strictly sequential dataflow:

    1. build/load T5        -> encode prompts      -> free T5
    2. build/load VAE       -> encode controls     -> free VAE
    3. build/load DiT       -> denoise (latent out)-> free DiT
    4. rebuild/reload VAE   -> decode -> frames

Between stages only the tiny stage OUTPUTS stay on device (prompt embeds
8 MB, geoada context 34 MB, latents 8 MB at 480p x 81f). Stage 3 runs the
DiT quantized (models.wan_dit.init_wan_dit_quantized builds it directly in
int4/int8 — bf16 never materializes) and, for the 14B GeoAdapter, with
SEQUENTIAL CFG (pipeline.cfg_parallel=False) so the activation working set
is batch-1.

`generate_staged` drives an ordinary VerseCrafterPipeline whose param slots
start empty; `fresh_init_factories` / `checkpoint_factories` supply the
per-component builders.
"""

from __future__ import annotations

import dataclasses
import gc
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class StageFactories:
    """Per-component parameter builders. Each is called when its stage
    begins and the result is dropped when the stage ends; `vae` is called
    twice (encode and decode stages)."""

    t5: Callable[[], Any]
    vae: Callable[[], Any]
    dit: Callable[[], Any]
    bits: int = 4  # DiT weight storage width (0 = unquantized bf16) — the
    #                auto_cfg_parallel memory model needs it


def _free(pipe, attr: str):
    """Drop a component's params and force the host references dead so the
    device buffers actually free before the next stage allocates."""
    setattr(pipe, attr, None)
    gc.collect()


def generate_staged(
    pipe,
    factories: StageFactories,
    prompt,
    negative_prompt: str = "",
    control_videos: Optional[Sequence[np.ndarray]] = None,
    mask_video: Optional[np.ndarray] = None,
    subject_ref_images: Optional[Sequence[np.ndarray]] = None,
    height: int = 480,
    width: int = 832,
    num_frames: int = 81,
    output_type: str = "uint8",
    dtype=jnp.bfloat16,
    progress: Optional[Callable[[int, int], None]] = None,
    record_teacache: bool = False,
    **call_kwargs,
) -> np.ndarray:
    """Run one generation with staged weight residency.

    `pipe` is a VerseCrafterPipeline that may have been constructed with
    dit_params/vae_params/t5_params = None; configs must be set. Stage wall
    times (build + run per stage) land on `pipe.last_stage_profile`.
    call_kwargs pass through to the denoise __call__ (num_inference_steps,
    guidance_scale, shift, seed, ...).

    record_teacache=True: instead of generating, run the DiT stage as a
    TeaCache trajectory recording (pipe.record_teacache_stats) and return
    (rel_e0, rel_residual) — the staged-residency path to FITTING TeaCache
    coefficients for models too large to stay resident (14B on one v5e).
    """
    profile: Dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        profile[name] = round(time.perf_counter() - t0, 2)
        return out

    batch = 1 if isinstance(prompt, str) else len(prompt)

    # -- stage 1: text ----------------------------------------------------
    pipe.t5_params = timed("t5_build", factories.t5)
    embeds = timed(
        "t5_encode",
        lambda: jax.block_until_ready(
            pipe.encode_prompt(prompt, negative_prompt).astype(dtype)))
    _free(pipe, "t5_params")
    neg_embeds, pos_embeds = embeds[:batch], embeds[batch:]

    # -- stage 2: controls -------------------------------------------------
    if mask_video is None:
        mask_video = np.ones((batch, 1, num_frames, height, width), np.float32)
    pipe.vae_params = timed("vae_build", factories.vae)
    geoada_context, n_ref = timed(
        "encode_controls",
        lambda: jax.block_until_ready(pipe.encode_controls(
            control_videos, mask_video, dtype,
            subject_ref_images=subject_ref_images)))
    _free(pipe, "vae_params")

    # -- stage 3: denoise ---------------------------------------------------
    if getattr(pipe, "expert_swap", None) is not None:
        # staged timestep-MoE: experts build lazily at the sigma-boundary
        # crossings inside the denoise loop (pipeline.py expert_swap hook);
        # their build times land inside the denoise wall
        pipe.dit_params = None
        pipe._resident_expert = None
    else:
        pipe.dit_params = timed("dit_build", factories.dit)
    if record_teacache:
        # full (never-skipping) trajectory recording with the DiT resident
        # — feeds tc.fit_teacache_coefficients; see record_teacache_stats
        stats = timed(
            "record",
            lambda: pipe.record_teacache_stats(
                prompt_embeds=pos_embeds,
                negative_prompt_embeds=neg_embeds,
                geoada_context=geoada_context,
                height=height, width=width, num_frames=num_frames,
                dtype=dtype, progress=progress, **call_kwargs))
        _free(pipe, "dit_params")
        pipe._resident_expert = None
        # the record trajectory's final latents are a full-quality ungated
        # generation — strip reference-frame slots so the caller can decode
        # them directly (saves a whole second denoise at 14B/720p scale)
        lat = getattr(pipe, "last_record_latents", None)
        if lat is not None and n_ref:
            pipe.last_record_latents = lat[:, :, n_ref:]
        profile["total"] = round(sum(
            v for v in profile.values() if isinstance(v, float)), 2)
        pipe.last_stage_profile = profile
        return stats
    latents = timed(
        "denoise",
        lambda: pipe(
            prompt_embeds=pos_embeds, negative_prompt_embeds=neg_embeds,
            geoada_context=geoada_context,
            height=height, width=width, num_frames=num_frames,
            output_type="latent", dtype=dtype, progress=progress,
            **call_kwargs))
    _free(pipe, "dit_params")
    pipe._resident_expert = None
    if n_ref:  # strip prepended reference-frame slots (pipeline:927-930)
        latents = latents[:, :, n_ref:]

    # -- stage 4: decode ----------------------------------------------------
    pipe.vae_params = timed("vae_rebuild", factories.vae)
    video = timed("decode",
                  lambda: pipe.decode_latents(latents, output_type))
    _free(pipe, "vae_params")

    denoise_wall = dict(getattr(pipe, "last_wall_profile", {}) or {})
    profile["total"] = round(sum(profile.values()), 2)
    profile["denoise_wall"] = denoise_wall
    pipe.last_stage_profile = profile
    return video


def estimate_denoise_gb(dit_cfg, bits: int, tokens: int,
                        cfg_batch: int = 2) -> float:
    """Estimated peak HBM (GB) of one denoise step — the live-set model of
    scripts/analyze_14b_sp.py made FFN-chunking aware (models.wan_dit
    FFN_CHUNK_ROWS: above 70k rows the [rows, ffn] hidden never fully
    materializes). Calibrated against chip ground truth on the 16 GB v5e
    (re-run 2026-08-20 — the chunk-aware estimator shifted every point,
    so the old 19.0 threshold let the measured-OOM 720p CFG-2 point
    through and the canonical run died in the remote AOT compile at
    22.68 GB used):

      RUNS:    480p81f CFG-2 geoada W4A8 (est 15.0 — staged e2e 01:26
               Aug 20), 480p81f CFG-1 geoada W4A8 (est 11.44),
               720p81f CFG-1 geoada W4A8 chunked (est 12.98)
      OOM:     720p81f CFG-2 geoada W4A8 (est 17.39 — AOT helper:
               22.68 G of 15.75 G hbm)

    so the fits-threshold sits at 16.0 GB-est: everything measured to run
    is under it, the measured OOM point is over."""
    GB = float(1 << 30)
    d, f = dit_cfg.dim, dit_cfg.ffn_dim
    n_geo = len(dit_cfg.geoada_layers or ())
    per_block = 8 * d * d + 2 * d * f
    params = (dit_cfg.num_layers + n_geo) * per_block
    # bytes/param measured on chip (COVERAGE.md weight-footprint row):
    # bf16 28.0 GB / int8 14.91 / W4A8 7.88 at the 14.05e9-param base model
    bytes_pp = {0: 2.14, 8: 1.14, 4: 0.602}[bits]
    weights = params * bytes_pp / GB
    rows = tokens * cfg_batch
    from versecrafter_tpu.models.wan_dit import FFN_CHUNK_ROWS
    if rows > FFN_CHUNK_ROWS:  # same chunk split as wan_dit._ffn_chunked
        ffn_rows = -(-rows // -(-rows // (FFN_CHUNK_ROWS // 4)))
    else:
        ffn_rows = rows
    act = (6 * rows * d + 2 * ffn_rows * f) * 2.0 / GB
    if n_geo:
        act *= 1.3  # the adapter's interleaved hint stream
    return weights + act


# chip-calibrated: see estimate_denoise_gb. Batched CFG-2 is selected only
# when its estimated step footprint clears this.
BATCHED_CFG_FITS_EST_GB = 16.0


def auto_cfg_parallel(dit_cfg, bits: int, tokens: int) -> bool:
    """Whether staged generation should run CFG batched (batch-2, one pass
    per step) instead of sequentially (two batch-1 passes). Sequential CFG
    exists because 720p×81f CFG-2 at 14B provably overflows one v5e
    (VERDICT r4 / analyze_14b_sp.py); at 480p×81f the batched step fits —
    don't pay two dispatches where one works. Reference CFG batching:
    pipeline_wan_versecrafter.py:878-906."""
    return estimate_denoise_gb(dit_cfg, bits, tokens) <= BATCHED_CFG_FITS_EST_GB


def fresh_init_factories(scale: str = "14b", bits: int = 4,
                         int8_compute: bool = True, dtype=jnp.bfloat16,
                         geoada: bool = True, seed: int = 0):
    """(factories, dit_cfg, vae_cfg, t5_cfg) for a random-init model at the
    given scale — the no-weights-in-image path for exercising the staged
    14B pipeline on real silicon. bits=0 keeps the DiT unquantized.

    '14b' uses the REAL component shapes of the reference flagship
    (umT5-xxl, Wan2.1 VAE, Wan2.1-T2V-14B + GeoAdapter —
    wan_civitai.yaml:9-26); '1.3b'/'tiny' shrink the DiT and T5 for smokes.
    """
    from versecrafter_tpu.core.config import (
        T5Config, VAEConfig, WAN21_1_3B, WAN21_14B, WanDiTConfig,
        versecrafter_14b)

    if scale == "14b":
        dit_cfg = versecrafter_14b() if geoada else WAN21_14B
        t5_cfg = T5Config()
    elif scale == "1.3b":
        t5_cfg = T5Config(num_layers=2, dim=512, dim_attn=512, dim_ffn=1024,
                          num_heads=8, vocab=1024)
        dit_cfg = dataclasses.replace(
            WAN21_1_3B, text_dim=t5_cfg.dim,
            **(dict(geoada_layers=(), geoada_in_dim=128) if geoada else {}))
    else:
        t5_cfg = T5Config(num_layers=2, dim=64, dim_attn=64, dim_ffn=128,
                          num_heads=4, vocab=512)
        dit_cfg = WanDiTConfig(
            dim=128, ffn_dim=256, num_heads=8, num_layers=4,
            text_dim=t5_cfg.dim,
            **(dict(geoada_layers=(), geoada_in_dim=128) if geoada else {}))
    vae_cfg = VAEConfig()

    def t5_factory():
        from versecrafter_tpu.models.t5 import init_t5
        return jax.jit(lambda k: init_t5(k, t5_cfg, dtype))(
            jax.random.key(seed + 2))

    def vae_factory():
        from versecrafter_tpu.models.vae import init_vae
        return jax.jit(lambda k: init_vae(k, vae_cfg, jnp.float32))(
            jax.random.key(seed + 1))

    def dit_factory():
        from versecrafter_tpu.models.wan_dit import (
            init_wan_dit, init_wan_dit_quantized)
        key = jax.random.key(seed)
        if bits:
            return init_wan_dit_quantized(key, dit_cfg, dtype, bits=bits,
                                          int8_compute=int8_compute)
        return jax.jit(lambda k: init_wan_dit(k, dit_cfg, dtype))(key)

    return StageFactories(t5_factory, vae_factory, dit_factory, bits), \
        dit_cfg, vae_cfg, t5_cfg


def staged_pipeline_factory(model_path: Optional[str] = None,
                            scale: str = "14b", bits: int = 4,
                            int8_compute: bool = True,
                            scheduler: str = "unipc"):
    """(shell_pipeline_factory, StageFactories) for SERVING with staged
    residency: the resident pipeline holds configs/compiled programs only;
    weights build per request stage (the compile + weight caches make
    rebuilds cheap — the W4A8 14B DiT rebuild measured 5.7 s warm). This is
    how a single 16 GB chip serves the 14B flagship; the reference instead
    dedicates GPUs 1..N-1 to a permanently resident model
    (api_server.py:925-1010)."""
    if model_path:
        factories, dit_cfg, vae_cfg, t5_cfg = checkpoint_factories(
            model_path, bits=bits, int8_compute=int8_compute)
    else:
        factories, dit_cfg, vae_cfg, t5_cfg = fresh_init_factories(
            scale=scale, bits=bits, int8_compute=int8_compute)

    def factory():
        from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline
        return VerseCrafterPipeline(
            dit_params=None, dit_cfg=dit_cfg, vae_params=None,
            vae_cfg=vae_cfg, t5_params=None, t5_cfg=t5_cfg,
            scheduler_name=scheduler, cfg_parallel=False)

    return factory, factories


def checkpoint_factories(model_dir: str, transformer_path: Optional[str] = None,
                         geoada_in_dim: int = 128, bits: int = 4,
                         int8_compute: bool = True, dtype=jnp.bfloat16):
    """(factories, dit_cfg, vae_cfg, t5_cfg) loading each component from a
    reference-layout checkpoint directory ON DEMAND (the staged analogue of
    core.convert.load_versecrafter, which loads everything up front).

    The DiT converts on the HOST CPU backend and then quantizes block by
    block onto the accelerator — the full bf16 tree (28 GB at 14B) never
    touches device HBM."""
    import json
    import os

    from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig
    from versecrafter_tpu.core.convert import (
        convert_wan_dit, convert_wan_t5, convert_wan_vae,
        load_torch_state_dict)

    tdir = transformer_path or model_dir
    with open(os.path.join(tdir, "config.json")) as f:
        tc = json.load(f)
    dit_cfg = WanDiTConfig(
        model_type=tc.get("model_type", "t2v"),
        patch_size=tuple(tc.get("patch_size", (1, 2, 2))),
        in_dim=tc.get("in_dim", tc.get("in_channels", 16)),
        dim=tc.get("dim", tc.get("hidden_size", 2048)),
        ffn_dim=tc.get("ffn_dim", 8192),
        freq_dim=tc.get("freq_dim", 256),
        text_dim=tc.get("text_dim", 4096),
        out_dim=tc.get("out_dim", 16),
        num_heads=tc.get("num_heads", 16),
        num_layers=tc.get("num_layers", 32),
        geoada_layers=tuple(tc["geoada_layers"]) if tc.get("geoada_layers")
        else (() if "geoada_in_dim" in tc or geoada_in_dim else None),
        geoada_in_dim=geoada_in_dim or tc.get("geoada_in_dim"),
    )
    t5_cfg, vae_cfg = T5Config(), VAEConfig()

    def t5_factory():
        return convert_wan_t5(load_torch_state_dict(
            os.path.join(model_dir, "models_t5_umt5-xxl-enc-bf16.pth")),
            t5_cfg, dtype)[0]

    def vae_factory():
        return convert_wan_vae(load_torch_state_dict(
            os.path.join(model_dir, "Wan2.1_VAE.pth")),
            vae_cfg, jnp.float32)[0]

    def dit_factory():
        from versecrafter_tpu.utils.quantize import quantize_tree
        # convert on the host backend: torch tensors -> CPU jnp arrays
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params, _ = convert_wan_dit(
                load_torch_state_dict(tdir), dit_cfg, dtype)
        if not bits:
            return jax.device_put(params)
        from versecrafter_tpu.models.wan_dit import _alloc_stack, _write_stack
        gs = 0 if (bits == 4 and int8_compute) else None
        quant = jax.jit(lambda p: quantize_tree(p, bits=bits, group_size=gs))

        # per-layer transfer+quantize for the stacked blocks, written into
        # preallocated donated stacks — the device transient stays one bf16
        # layer + the quantized stacks; small leaves move whole
        out = {}
        for name, sub in params.items():
            if name in ("blocks", "geoada_blocks"):
                leaves, treedef = jax.tree_util.tree_flatten(sub)
                n = leaves[0].shape[0]
                stacked = None
                for i in range(n):
                    layer = quant(jax.tree_util.tree_unflatten(
                        treedef,
                        [jax.device_put(np.asarray(l[i])) for l in leaves]))
                    if stacked is None:
                        stacked = _alloc_stack(layer, n)
                    stacked = _write_stack(stacked, layer, i)
                out[name] = stacked
            else:
                out[name] = quant(jax.device_put(sub))
        if int8_compute:
            from versecrafter_tpu.utils.quantize import tag_int8_compute
            out = tag_int8_compute(out)
        return out

    return StageFactories(t5_factory, vae_factory, dit_factory, bits), \
        dit_cfg, vae_cfg, t5_cfg
