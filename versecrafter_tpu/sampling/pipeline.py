"""End-to-end controlled video generation pipeline.

Re-implements the behavior of the reference's `WanVerseCrafterPipeline`
(/root/reference/versecrafter/pipeline/pipeline_wan_versecrafter.py:170-948):
T5 prompt encoding, control-video VAE encoding (4 control videos -> 64 ch),
mask pixel-shuffle encoding (8x8 -> 64 ch), 128-ch GeoAdapter context,
noise init, CFG denoising loop with flow-matching solvers, VAE decode.

TPU-native design:
- one jitted denoise step reused across all steps (fixed shapes per
  resolution bucket) with TeaCache as an in-graph lax.cond and cfg-skip as a
  second compiled variant on the cond-only half;
- device-resident state end to end: latents/residuals never leave HBM until
  the final decode;
- parallelism arrives via the mesh + shardings passed at construction
  (parallel/sharding.py), not via monkey-patched attention.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.config import (
    SchedulerConfig, T5Config, VAEConfig, WanDiTConfig)
from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
from versecrafter_tpu.models.t5 import t5_encode
from versecrafter_tpu.models.vae import vae_decode, vae_encode
from versecrafter_tpu.models.wan_dit import wan_dit_forward
from versecrafter_tpu.sampling import teacache as tc
from versecrafter_tpu.sampling.schedulers import make_scheduler
from versecrafter_tpu.utils.tokenizer import load_tokenizer


def encode_mask_pixelshuffle(mask: jnp.ndarray, latent_t: int,
                             vae_stride=(4, 8, 8)) -> jnp.ndarray:
    """[B, 1, T, H, W] binary mask -> [B, 64, latent_t, H/8, W/8].

    8x8 spatial pixel-shuffle into channels + nearest-exact temporal resize
    (geoada_encode_masks, pipeline_wan_versecrafter.py:440-486)."""
    b, _, t, h, w = mask.shape
    sh = vae_stride[1]
    hh, ww = h // sh, w // sh
    m = mask[:, 0]  # [B, T, H, W]
    m = m.reshape(b, t, hh, sh, ww, sh)
    m = m.transpose(0, 3, 5, 1, 2, 4)  # [B, 8, 8, T, h, w]
    m = m.reshape(b, sh * sh, t, hh, ww)
    # nearest-exact over depth t -> latent_t
    idx = jnp.floor((jnp.arange(latent_t) + 0.5) * t / latent_t).astype(jnp.int32)
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.take(m, idx, axis=2)


@dataclasses.dataclass
class VerseCrafterPipeline:
    """Holds params + configs; orchestrates jitted stages.

    Components mirror the reference pipeline's registered modules
    (tokenizer / text_encoder / vae / transformer / scheduler,
    pipeline_wan_versecrafter.py:187-209)."""

    dit_params: Any
    dit_cfg: WanDiTConfig
    vae_params: Any
    vae_cfg: VAEConfig
    t5_params: Any
    t5_cfg: T5Config
    tokenizer: Any = None
    # optional CLIP vision tower for i2v conditioning (models/clip.py;
    # reference models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth
    # consumed via img_emb + k_img/v_img, wan_transformer3d.py:1045-1047)
    clip_params: Any = None
    clip_cfg: Any = None
    scheduler_name: str = "unipc"
    scheduler_cfg: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    attn_impl: str = "auto"
    # Multi-chip inference: a jax.sharding.Mesh (core.mesh.make_mesh). When
    # set, DiT params are sharded (fsdp/tp), activations ride the sp axis via
    # attn_impl="sp", and the denoise step compiles as one GSPMD program —
    # the TPU equivalent of the reference's torchrun --ulysses_degree
    # --ring_degree path (versecrafter_inference.py:271-281).
    mesh: Any = None
    # Wan2.2 timestep-MoE: a second (high-noise) expert selected when
    # sigma >= moe_boundary (transformer_combination_type 'moe',
    # config/wan2.2/wan_civitai_t2v.yaml:3-8). Same architecture/config as
    # dit_params, so both experts share one compiled step.
    dit_params_high: Any = None
    moe_boundary: float = 0.875
    # STAGED timestep-MoE (Wan2.2 two-expert at 14B on one 16 GB chip):
    # the experts are TIME-sequential — denoising descends sigma, so the
    # high-noise expert finishes before the low-noise one starts. When set,
    # expert_swap("high"|"low") is called at the boundary crossing and must
    # return that expert's params; the previous expert's params are dropped
    # FIRST so only one ~8-11 GB expert is ever resident. Mutually
    # exclusive with a resident dit_params_high.
    expert_swap: Optional[Callable[[str], Any]] = None
    # acceleration state (enable_* mirror the reference's runtime toggles)
    teacache_threshold: float = 0.0
    teacache_skip_start: int = 5
    teacache_coefficients: Tuple[float, ...] = tc.VERSECRAFTER_COEFFS
    cfg_skip_ratio: float = 0.0
    # CFG execution layout. True (default): cond+uncond concatenated as one
    # batch-2 forward (pipeline_wan_versecrafter.py:878 — best throughput).
    # False: the two branches run SEQUENTIALLY as batch-1 forwards of the
    # same compiled program — HALF the activation working set, which is what
    # lets the 14B GeoAdapter (W4A8 ~11 GB weights) denoise at the full
    # 480p x 81f shape beside its weights on one 16 GB v5e. TeaCache tracks
    # cond/uncond with separate per-branch states (the reference does the
    # same, wan_transformer3d.py:1057-1080).
    cfg_parallel: bool = True
    # TeaCache observability: when True, per-step accumulator snapshots are
    # collected into teacache_accum_history, reset at each __call__ (accum
    # != 0 after a step == that CFG row skipped — a computed step resets its
    # accumulator to exactly 0.0, while a skip adds the rescale polynomial,
    # which may be NEGATIVE at small rel-L1). record_teacache_stats() uses
    # teacache_record internally to collect coefficient-fitting trajectories.
    teacache_debug: bool = False
    teacache_record: Any = None

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = load_tokenizer(vocab_size=self.t5_cfg.vocab)
        self._angles = tuple(
            jnp.asarray(a) for a in rope_3d_angles(
                self.dit_cfg.head_dim, self.dit_cfg.rope_max_pos,
                self.dit_cfg.rope_theta))
        self._jit_cache: Dict[Any, Callable] = {}
        self.teacache_accum_history = []
        if self.mesh is not None:
            self.set_mesh(self.mesh)

    def set_mesh(self, mesh):
        """Shard the pipeline onto a device mesh: DiT params over (fsdp, tp),
        T5 FSDP-sharded over all axes (the reference's fsdp_text_encoder=True
        default — umT5-xxl is ~11 GB bf16, replication would dominate a
        16 GB chip), VAE/CLIP weights replicated, attention switched to the
        sequence-parallel collectives. Idempotent (device_put of an already
        correctly-sharded tree is a no-op)."""
        from versecrafter_tpu.parallel.sharding import (
            replicate, shard_dit_params, shard_t5_params)
        self.mesh = mesh
        if mesh is None or mesh.size == 1:
            return
        self.dit_params = shard_dit_params(self.dit_params, mesh)
        if self.dit_params_high is not None:
            self.dit_params_high = shard_dit_params(self.dit_params_high, mesh)
        if self.t5_params is not None:
            self.t5_params = shard_t5_params(self.t5_params, mesh)
        if self.vae_params is not None:
            self.vae_params = replicate(self.vae_params, mesh)
        if self.clip_params is not None:
            self.clip_params = replicate(self.clip_params, mesh)
        self.attn_impl = "sp"
        self._jit_cache.clear()

    def _mesh_ctx(self):
        from versecrafter_tpu.parallel.sharding import mesh_context
        return mesh_context(
            self.mesh if self.mesh is not None and self.mesh.size > 1 else None)

    # -- acceleration toggles (reference API parity:
    #    enable_teacache / enable_cfg_skip / enable_riflex) ----------------
    def enable_teacache(self, threshold: float, skip_start: int = 5,
                        coefficients=tc.VERSECRAFTER_COEFFS):
        self.teacache_threshold = threshold
        self.teacache_skip_start = skip_start
        self.teacache_coefficients = tuple(coefficients)

    def disable_teacache(self):
        self.teacache_threshold = 0.0

    def enable_cfg_skip(self, ratio: float):
        self.cfg_skip_ratio = ratio

    def enable_int8_attention(self, enabled: bool = True):
        """int8 QK^T scoring inside the fused attention kernel (per-row
        quantized q/k tiles, s8 x s8 -> s32 MXU dots at ~2x the bf16 rate
        on v5e; PV stays bf16). Inference-only approximation — opt in
        after judging quality at the operating point. NOTE: module-global,
        like the other fused-kernel toggles (wan_dit.INT8_QK_SCORE)."""
        from versecrafter_tpu.models import wan_dit
        wan_dit.INT8_QK_SCORE = bool(enabled)

    def quantize_weights(self, int8_compute: bool = False, act_scales=None,
                         bits: int = 8, act_scales_high=None,
                         int8_sites=None):
        """int8 weight-only storage for the DiT (fp8-mode analogue,
        versecrafter_inference.py:288-301); dequant happens in-graph.

        int8_compute=True additionally runs the block matmuls (qkv/o,
        cross-attn, FFN) as W8A8 int8 MXU dots (~2x bf16 matmul throughput
        on v5e) with dynamic per-tensor activation scales — or calibrated
        static ones when `act_scales` is given (utils.quantize:
        wan_dit_forward(calibrate=True) -> fit_act_scales).

        bits=4: nibble-packed weight storage (half the HBM of int8;
        coarser quantization — 128-row group scales by default). Combined
        with int8_compute this is the W4A8 mode: the packed nibbles unpack
        to s8 values in [-7, 7] directly usable by the int8 MXU dot, so
        14B runs with ~7.5 GB weights AND ~2x matmul rate — the group
        scales are dropped to per-channel there (the dot epilogue folds
        one scale per output channel).

        int8_sites: optional substring filter over the eligible compute
        sites (e.g. ("ffn",) runs only the FFN dots as W8A8) — the chip
        microbench shows the dynamic-scale win is shape-dependent
        (utils.quantize.tag_int8_compute docstring)."""
        from versecrafter_tpu.utils.quantize import (quantize_tree,
                                                     tag_int8_compute)
        gs = 0 if (bits == 4 and int8_compute) else None
        self.dit_params = quantize_tree(self.dit_params, bits=bits,
                                        group_size=gs)
        if int8_compute:
            self.dit_params = tag_int8_compute(self.dit_params, act_scales,
                                               sites=int8_sites)
        if self.dit_params_high is not None:
            self.dit_params_high = quantize_tree(self.dit_params_high,
                                                 bits=bits, group_size=gs)
            if int8_compute:
                # the MoE experts see DISJOINT sigma ranges — scales
                # calibrated on one expert would clip the other's
                # activations, so the high-noise expert gets its own
                # calibration (act_scales_high) or falls back to DYNAMIC
                # per-tensor scales rather than inheriting the wrong ones
                self.dit_params_high = tag_int8_compute(
                    self.dit_params_high, act_scales_high,
                    sites=int8_sites)
        self._jit_cache.clear()

    def merge_lora(self, lora_sd, weight: float = 1.0):
        from versecrafter_tpu.utils.lora import merge_lora
        self.dit_params = merge_lora(self.dit_params, lora_sd, weight)
        self._jit_cache.clear()

    def unmerge_lora(self, lora_sd, weight: float = 1.0):
        from versecrafter_tpu.utils.lora import unmerge_lora
        self.dit_params = unmerge_lora(self.dit_params, lora_sd, weight)
        self._jit_cache.clear()

    def enable_riflex(self, k: int, L_test: int, L_test_scale: Optional[float] = None):
        """RoPE intrinsic-frequency override for temporal extrapolation
        (enable_riflex, wan_transformer3d.py:873-888)."""
        self._angles = tuple(
            jnp.asarray(a) for a in rope_3d_angles(
                self.dit_cfg.head_dim, self.dit_cfg.rope_max_pos,
                self.dit_cfg.rope_theta, riflex_k=k, riflex_L_test=L_test,
                riflex_L_test_scale=L_test_scale))

    def record_teacache_stats(self, *args, **kwargs):
        """Run one full (never-skipping) generation while recording the
        TeaCache observables, and return (rel_e0, rel_residual) — each
        [num_steps-1, B] — ready for tc.fit_teacache_coefficients. This is
        the trajectory-recording method behind the reference's hardcoded
        polynomial (versecrafter_inference.py:306; TeaCache's published
        fitting recipe): rel_e0 is the relative-L1 drift of the
        time-modulation tensor between consecutive steps, rel_residual the
        drift of the transformer-blocks residual. Accepts the same arguments
        as __call__ (output is discarded; pass several prompts/seeds and
        pool the results for a robust fit)."""
        self.teacache_record = []
        old_thresh = self.teacache_threshold
        old_skip = self.cfg_skip_ratio
        self.teacache_threshold = 0.0
        # cfg-skip slices the recorded tensors from 2B to B rows mid-run —
        # the stats must come from a FULL (never-skipping) trajectory.
        # Under SEQUENTIAL CFG (cfg_parallel=False — the 14B staged mode)
        # only the COND branch's state is recorded ([B] rows): one branch's
        # trajectory is what the reference's published fit uses too.
        self.cfg_skip_ratio = 0.0
        try:
            kwargs.setdefault("output_type", "latent")
            # the recording IS a full-quality ungated denoise — keep its
            # output so callers (staged fit-then-fire) can decode it into
            # a video instead of paying a second full trajectory
            self.last_record_latents = self(*args, **kwargs)
            rec = self.teacache_record
        finally:
            self.teacache_record = None
            self.teacache_threshold = old_thresh
            self.cfg_skip_ratio = old_skip
        mods = np.stack([r[0] for r in rec])      # [steps, B, 6, D]
        rel_res = np.stack([r[1] for r in rec])   # [steps, B]
        prev, cur = mods[:-1], mods[1:]
        rel_e0 = (np.abs(cur - prev).mean(axis=(2, 3))
                  / np.maximum(np.abs(prev).mean(axis=(2, 3)), 1e-8))
        return rel_e0, rel_res[1:]

    # full-sequence VAE above this voxel count would exceed single-chip HBM;
    # the streaming path is numerically identical (models/vae_stream.py)
    VAE_STREAM_THRESHOLD = 1 << 24

    def _shard_vae_input(self, x):
        """Under a mesh, place VAE inputs width-sharded over (sp, tp):
        GSPMD spatially partitions every conv of the jitted encode/decode
        (automatic halo exchange). Sharding propagates from the argument —
        no changes inside the VAE code."""
        if self.mesh is None or self.mesh.size == 1:
            return x
        from versecrafter_tpu.parallel.sharding import shard_vae_io
        return shard_vae_io(x, self.mesh)

    def _vae_encode_fn(self):
        """Cached jitted VAE encoder (a fresh jit(partial(...)) per call
        would recompile on every generation). Large inputs stream through
        the chunked encoder."""
        cfg = self.vae_cfg

        def encode(x):
            x = self._shard_vae_input(x)
            if x.shape[2] > 1 and np.prod(x.shape[2:]) > self.VAE_STREAM_THRESHOLD:
                from versecrafter_tpu.models.vae_stream import vae_encode_chunked
                return vae_encode_chunked(self.vae_params, cfg, x)
            key = ("vae_encode",)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(lambda p, x: vae_encode(p, cfg, x))
            return self._jit_cache[key](self.vae_params, x)

        return encode

    # -- stages ----------------------------------------------------------
    def encode_prompt(self, prompt, negative_prompt="") -> jnp.ndarray:
        """-> [2B, text_len, text_dim] (negative first, then positive —
        matching in_prompt_embeds = negative + positive, pipeline:740-743)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        negs = ([negative_prompt] * len(prompts)
                if isinstance(negative_prompt, str) else list(negative_prompt))
        return self.encode_texts(negs + prompts)

    def encode_texts(self, texts) -> jnp.ndarray:
        """-> [len(texts), text_len, text_dim]: ONE T5 pass over exactly
        these strings (the prompt_embeds path uses this to encode only the
        missing negatives instead of paying a full 2B encode_prompt)."""
        toks = self.tokenizer(list(texts), max_length=self.t5_cfg.text_length)
        key = ("t5_encode",)
        if key not in self._jit_cache:
            # one compiled program — eager umT5-xxl is hundreds of per-op
            # dispatches (measured 321 s over the device tunnel vs ~1 s jitted)
            t5_cfg = self.t5_cfg
            self._jit_cache[key] = jax.jit(
                lambda p, ids, m: t5_encode(p, t5_cfg, ids, m))
        return self._jit_cache[key](
            self.t5_params, jnp.asarray(toks["input_ids"]),
            jnp.asarray(toks["attention_mask"]))

    def encode_controls(self, control_videos: Sequence[np.ndarray],
                        mask_video: np.ndarray, dtype=jnp.bfloat16,
                        subject_ref_images: Optional[Sequence[np.ndarray]] = None
                        ) -> Tuple[jnp.ndarray, int]:
        """control_videos: list of [B, 3, T, H, W] in [0, 1]; mask_video
        [B, 1, T, H, W] in [0, 1] -> (geoada context [B, 128, T'+R, H/8, W/8],
        num_ref_latents R).

        subject_ref_images (list of [B, 3, 1, H, W]): reference frames are
        VAE-encoded and PREPENDED on the temporal axis, occupying the first
        control's channel block with zeros elsewhere, and zero mask channels
        (geoada_encode_multi_frames ref handling,
        pipeline_wan_versecrafter.py:428-486)."""
        # per-video encode, deliberately NOT batch-stacked: batching even
        # two 480p x 81f controls through the streaming encoder
        # RESOURCE_EXHAUSTED the 16 GB chip next to the resident T5/DiT
        # weights (pipe_warm3, Aug 18). The host-side dtype convert +
        # upload of the NEXT control runs in a worker thread UNDER the
        # current encode's device work (the _decode_stream_overlapped
        # pattern in reverse) — device programs stay strictly serialized
        # via block_until_ready, only transfers overlap.
        lat = []
        encode = self._vae_encode_fn()
        from concurrent.futures import ThreadPoolExecutor

        def _upload(cv):
            return jnp.asarray(cv, dtype)

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(_upload, control_videos[0])
            for i in range(len(control_videos)):
                x = nxt.result()
                if i + 1 < len(control_videos):
                    nxt = pool.submit(_upload, control_videos[i + 1])
                z = encode(x * 2.0 - 1.0)  # image processor normalize
                del x
                lat.append(jax.block_until_ready(z.astype(dtype)))
        zs = jnp.concatenate(lat, axis=1)
        stride = (self.vae_cfg.temporal_compression_ratio,
                  self.vae_cfg.spatial_compression_ratio,
                  self.vae_cfg.spatial_compression_ratio)
        m = encode_mask_pixelshuffle(jnp.asarray(mask_video, dtype),
                                     zs.shape[2], vae_stride=stride).astype(dtype)

        n_ref = 0
        if subject_ref_images:
            refs = []
            for r in subject_ref_images:
                rl = encode(jnp.asarray(r, dtype) * 2.0 - 1.0).astype(dtype)
                pad = jnp.zeros((rl.shape[0],
                                 zs.shape[1] - rl.shape[1], *rl.shape[2:]), dtype)
                refs.append(jnp.concatenate([rl, pad], axis=1))
            ref_lat = jnp.concatenate(refs, axis=2)
            n_ref = ref_lat.shape[2]
            zs = jnp.concatenate([ref_lat, zs], axis=2)
            m = jnp.concatenate(
                [jnp.zeros((m.shape[0], m.shape[1], n_ref, *m.shape[3:]), dtype), m],
                axis=2)
        return jnp.concatenate([zs, m], axis=1), n_ref

    def _denoise_fn(self, cfg_batched: bool):
        """Jitted model step: returns (noise_pred, tea_state).

        `extras` carries optional step-invariant conditioning (base-Wan
        surface): 'y' i2v latents concatenated on channels, 'clip_fea' CLIP
        image tokens for the img-KV cross-attention branch, 'y_camera'
        SimpleAdapter camera maps. CFG applies to the text only, so each is
        duplicated across both halves of the batch."""
        dit_cfg = self.dit_cfg
        recording = self.teacache_record is not None
        use_tea = self.teacache_threshold > 0.0 or recording

        def fn(dit_params, latents, t, step_idx, context, geoada, cos, sin,
               tea_state, guidance, geoada_scale, extras):
            from versecrafter_tpu.utils.quantize import dequantize_tree
            # dequantize the small non-scanned parts here; the stacked
            # block weights dequantize PER LAYER inside wan_dit_blocks'
            # scan (a whole-tree dequant would materialize 2x the bf16
            # weights — 28 GB at 14B). No-op if unquantized.
            dit_params = {
                k: (v if k in ("blocks", "geoada_blocks")
                    else dequantize_tree(v))
                for k, v in dit_params.items()}
            if cfg_batched:
                x = jnp.concatenate([latents, latents], axis=0)
                g = jnp.concatenate([geoada, geoada], axis=0)
                ctx = context
                extras = {k: jnp.concatenate([v, v], axis=0)
                          for k, v in extras.items()}
            else:  # cond-only (cfg-skip window): positive prompts are the
                # second half of context
                x = latents
                g = geoada
                ctx = context[context.shape[0] // 2:]
            tvec = jnp.full((x.shape[0],), t, jnp.float32)
            y_in = extras.get("y")
            clip = extras.get("clip_fea")
            ycam = extras.get("y_camera")

            if not use_tea:
                pred = wan_dit_forward(
                    dit_params, dit_cfg, x, tvec, ctx, cos, sin,
                    geoada_context=g, geoada_scale=geoada_scale,
                    y=y_in, clip_fea=clip, y_camera=ycam,
                    attn_impl=self.attn_impl)
                new_state = tea_state
            else:
                from versecrafter_tpu.models.wan_dit import (
                    wan_dit_blocks, wan_dit_embed, wan_dit_head, patchify,
                    _linear)
                if y_in is not None:
                    x = jnp.concatenate([x, y_in], axis=1)
                tokens, e, e0, ctx_e, ctx_img, grid = wan_dit_embed(
                    dit_params, dit_cfg, x, tvec, ctx, clip_fea=clip,
                    y_camera=ycam)
                gtok = _linear(dit_params["geoada_patch_embedding"],
                               patchify(g, dit_cfg.patch_size)) \
                    if dit_cfg.has_geoadapter else None
                if self.attn_impl == "sp":
                    from versecrafter_tpu.parallel.sharding import (
                        constrain_tokens)
                    tokens = constrain_tokens(tokens)
                    if gtok is not None:
                        gtok = constrain_tokens(gtok)

                def run(tk):
                    return wan_dit_blocks(
                        dit_params, dit_cfg, tk, e0, cos, sin, ctx_e,
                        geoada_tokens=gtok, geoada_scale=geoada_scale,
                        attn_impl=self.attn_impl, context_img=ctx_img)

                if recording:
                    tokens, new_state = tc.recording_blocks(
                        run, tokens, e0, tea_state)
                else:
                    tokens, new_state = tc.gated_blocks(
                        run, tokens, e0, tea_state, step_idx,
                        self.teacache_threshold, self.teacache_skip_start,
                        self.teacache_coefficients)
                pred = wan_dit_head(dit_params, dit_cfg, tokens, e, grid)

            if cfg_batched:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance * (cond - uncond)
            from versecrafter_tpu.parallel.sharding import current_mesh
            ctx_mesh = current_mesh()
            if ctx_mesh is not None:
                # replicate the velocity prediction so the (tiny) host-side
                # scheduler math sees a whole array — the reference's final
                # all_gather(x, dim=1) (wan_transformer3d.py:1099-1100)
                from jax.sharding import NamedSharding, PartitionSpec
                pred = jax.lax.with_sharding_constraint(
                    pred, NamedSharding(ctx_mesh["mesh"], PartitionSpec()))
            return pred, new_state

        return jax.jit(fn, donate_argnums=(8,))

    def _denoise_fn_hostgated(self, calc: bool):
        """Batch-1 sequential-CFG step with the TeaCache decision taken on
        HOST (tc.host_gate over wan_dit_e0 — the metric depends only on the
        timestep trajectory): `calc=True` runs the blocks and returns
        (pred, fresh_tokens) — the residual is stored by the SEPARATE
        `_residual_fn_hostgated` program; `calc=False` applies a passed
        residual (embed + add + head only, the reference's cheap path).
        This replaces the in-graph lax.cond whose dual-path [1,S,D] temps +
        fragmentation overflowed the v5e by 1.58 GB at 75,600 tokens
        (14B W4A8 720p x 81f, chipq5 canon720). Storing the residual
        in-program ALSO overflowed (chipq6 canon720_gated): `fresh - tokens`
        keeps the embed tokens live across the whole 40-block scan
        (+0.77 GB at the scan's peak) and adds the diff + int8-quantize
        temps on top — returning `fresh` instead costs its 0.77 GB only at
        program END (after the scan's working set has died) and moves the
        subtract/quantize into a ~2.7 GB follow-up program."""
        dit_cfg = self.dit_cfg

        def fn(dit_params, latents, t, context, geoada, cos, sin,
               residual, geoada_scale, extras):
            from versecrafter_tpu.utils.quantize import dequantize_tree
            from versecrafter_tpu.models.wan_dit import (
                wan_dit_blocks, wan_dit_embed, wan_dit_head, patchify,
                _linear)
            dit_params = {
                k: (v if k in ("blocks", "geoada_blocks")
                    else dequantize_tree(v))
                for k, v in dit_params.items()}
            x = latents
            ctx = context[context.shape[0] // 2:]  # cond-only convention
            tvec = jnp.full((x.shape[0],), t, jnp.float32)
            y_in = extras.get("y")
            clip = extras.get("clip_fea")
            ycam = extras.get("y_camera")
            if y_in is not None:
                x = jnp.concatenate([x, y_in], axis=1)
            tokens, e, e0, ctx_e, ctx_img, grid = wan_dit_embed(
                dit_params, dit_cfg, x, tvec, ctx, clip_fea=clip,
                y_camera=ycam)
            gtok = _linear(dit_params["geoada_patch_embedding"],
                           patchify(geoada, dit_cfg.patch_size)) \
                if dit_cfg.has_geoadapter else None
            if self.attn_impl == "sp":
                from versecrafter_tpu.parallel.sharding import (
                    constrain_tokens)
                tokens = constrain_tokens(tokens)
                if gtok is not None:
                    gtok = constrain_tokens(gtok)
            if calc:
                tokens = wan_dit_blocks(
                    dit_params, dit_cfg, tokens, e0, cos, sin, ctx_e,
                    geoada_tokens=gtok, geoada_scale=geoada_scale,
                    attn_impl=self.attn_impl, context_img=ctx_img)
            else:
                tokens = tokens + tc._load_residual(residual, tokens.dtype)
            pred = wan_dit_head(dit_params, dit_cfg, tokens, e, grid)
            from versecrafter_tpu.parallel.sharding import current_mesh
            ctx_mesh = current_mesh()
            if ctx_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                pred = jax.lax.with_sharding_constraint(
                    pred, NamedSharding(ctx_mesh["mesh"], PartitionSpec()))
            return (pred, tokens) if calc else pred

        return jax.jit(fn)

    def _residual_fn_hostgated(self):
        """Second (small) program of the host-gated calc step: recompute the
        cheap patch embedding from the PRE-step latents — bit-reproducible,
        it depends only on latents/extras and the embedding weights — and
        store `fresh - tokens` as the TeaCache residual (int8 above
        tc.TEA_RES_QUANT_ROWS). Runs strictly AFTER the big step has
        drained, so its working set (~2.7 GB at 75,600 tok) never coexists
        with the block scan's."""
        dit_cfg = self.dit_cfg

        def fn(dit_params, latents, t, context, fresh, extras):
            from versecrafter_tpu.utils.quantize import dequantize_tree
            from versecrafter_tpu.models.wan_dit import wan_dit_embed
            dit_params = {
                k: (v if k in ("blocks", "geoada_blocks")
                    else dequantize_tree(v))
                for k, v in dit_params.items()}
            x = latents
            ctx = context[context.shape[0] // 2:]
            tvec = jnp.full((x.shape[0],), t, jnp.float32)
            y_in = extras.get("y")
            if y_in is not None:
                x = jnp.concatenate([x, y_in], axis=1)
            tokens, _, _, _, _, _ = wan_dit_embed(
                dit_params, dit_cfg, x, tvec, ctx,
                clip_fea=extras.get("clip_fea"),
                y_camera=extras.get("y_camera"))
            if self.attn_impl == "sp":
                from versecrafter_tpu.parallel.sharding import (
                    constrain_tokens)
                tokens = constrain_tokens(tokens)
            quantized = (tokens.shape[0] * tokens.shape[1]
                         > tc.TEA_RES_QUANT_ROWS)
            return tc._store_residual(
                fresh - tokens if quantized
                else (fresh - tokens).astype(tokens.dtype), quantized)

        return jax.jit(fn)

    def _get_residual_hostgated(self, key_extra=()):
        key = ("hostgated_res", self.attn_impl, *key_extra)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._residual_fn_hostgated()
        return self._jit_cache[key]

    def _get_denoise_hostgated(self, calc: bool, key_extra=()):
        from versecrafter_tpu.models import wan_dit
        key = ("hostgated", calc, self.attn_impl,
               wan_dit.INT8_QK_SCORE, wan_dit.PROJ_STAT_FUSION, *key_extra)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._denoise_fn_hostgated(calc)
        return self._jit_cache[key]

    def _e0_fn(self):
        """Tiny jitted program computing the [B,6,D] time-modulation vector
        (jit prunes the unused weight arguments, so only the time-embedding
        tables reach the executable)."""
        key = ("e0",)
        if key not in self._jit_cache:
            from versecrafter_tpu.models.wan_dit import wan_dit_e0
            dit_cfg = self.dit_cfg
            self._jit_cache[key] = jax.jit(
                lambda p, t: wan_dit_e0(p, dit_cfg, t))
        return self._jit_cache[key]

    def _cfg_combine(self):
        """uncond + g * (cond - uncond), the same expression the batched
        program applies after its split (one tiny compiled op — eager jnp
        here would be an extra ~0.3 s remote dispatch per step on axon)."""
        key = ("cfg_combine",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(lambda u, c, g: u + g * (c - u))
        return self._jit_cache[key]

    def _shard_tea_state(self, state: tc.TeaCacheState) -> tc.TeaCacheState:
        """Place TeaCache state on the mesh: residuals sharded like the token
        activations (dp, sp), the small per-row stats replicated — the
        sharded analogue of the reference's per-rank residual caches
        (wan_transformer3d.py:1068)."""
        if self.mesh is None or self.mesh.size == 1:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        res_spec = P("dp", "sp", None)
        b, s, _ = tc.res_shape(state)
        if b % self.mesh.shape["dp"] or s % self.mesh.shape["sp"]:
            res_spec = P()
        return tc.TeaCacheState(
            prev_mod=jax.device_put(
                state.prev_mod, NamedSharding(self.mesh, P())),
            prev_residual=jax.tree_util.tree_map(
                lambda r: jax.device_put(
                    r, NamedSharding(self.mesh, res_spec)),
                state.prev_residual),
            accum=jax.device_put(state.accum, NamedSharding(self.mesh, P())),
            valid=jax.device_put(state.valid, NamedSharding(self.mesh, P())),
        )

    def _get_denoise(self, cfg_batched: bool, key_extra=()):
        from versecrafter_tpu.models import wan_dit
        key = (cfg_batched, self.teacache_threshold, self.teacache_skip_start,
               self.teacache_coefficients, self.attn_impl,
               self.teacache_record is not None,
               # trace-time kernel toggles a resident server may flip
               # per-request (model_server int8_attention param) — without
               # them in the key a cached program silently keeps the flag
               # value it was first traced with
               wan_dit.INT8_QK_SCORE, wan_dit.PROJ_STAT_FUSION,
               *key_extra)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._denoise_fn(cfg_batched)
        return self._jit_cache[key]

    # -- main entry --------------------------------------------------------
    def __call__(
        self,
        prompt=None,
        negative_prompt: str = "",
        control_videos: Optional[Sequence[np.ndarray]] = None,
        video: Optional[np.ndarray] = None,
        mask_video: Optional[np.ndarray] = None,
        subject_ref_images: Optional[Sequence[np.ndarray]] = None,
        geoada_context: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None,
        clip_fea: Optional[jnp.ndarray] = None,
        clip_image: Optional[np.ndarray] = None,
        camera_video: Optional[np.ndarray] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 30,
        timesteps: Optional[Sequence[float]] = None,
        guidance_scale: float = 5.0,
        shift: float = 16.0,
        seed: int = 2025,
        latents: Optional[jnp.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        geoada_context_scale: float = 1.0,
        dtype=jnp.bfloat16,
        output_type: str = "numpy",
        progress: Optional[Callable[[int, int], None]] = None,
        callback_on_step_end: Optional[Callable] = None,
    ):
        """Returns video as numpy [B, T, H, W, 3] in [0,1] (output_type
        'numpy'), uint8 0..255 (output_type 'uint8' — quantized ON DEVICE,
        4x less host transfer; what serving/CLI use before mp4 encode), or
        latents (output_type 'latent').

        Base-Wan conditioning surface (optional, wan_transformer3d.py
        :969-977, 1045-1047): `y` i2v latents [B, C_y, F_lat, H_lat, W_lat]
        concatenated on channels; `clip_fea` [B, 257, 1280] CLIP image
        tokens (or `clip_image` [H, W, 3] encoded through the pipeline's
        clip tower); `camera_video` [B, C, F, H, W] camera-pose maps for
        the SimpleAdapter.

        Reference passthrough surface (pipeline_wan_versecrafter.py:650-948):
        `video` [B,3,T,H,W] in [0,1] — when no control_videos are given, the
        init video is masked to the keep region (init*(mask<0.5), :793-807;
        NOTE the reference as written hits a NameError in this branch —
        input_video vs input_videos at :807/:832 — this implements the
        intended semantics: the masked video becomes the single geoada
        control source); `timesteps` custom schedule; `latents` initial
        noise override; `prompt_embeds`/`negative_prompt_embeds` skip the T5
        encode; `callback_on_step_end(pipe, i, t, {'latents': ...}) ->
        optional dict` may replace `latents` between steps (:916-925)."""
        # wall-clock profile of the generation phases (host+device+tunnel),
        # stashed on self.last_wall_profile — the axon tunnel's 19 MB/s
        # download makes the WALL split diverge from the device split, so
        # the CLIs print this to attribute e2e time honestly
        wall: Dict[str, float] = {}
        _t0 = time.perf_counter()

        def _mark(name, _box=[_t0]):
            now = time.perf_counter()
            wall[name] = wall.get(name, 0.0) + (now - _box[0])
            _box[0] = now

        if prompt_embeds is not None:
            batch = prompt_embeds.shape[0]
            if negative_prompt_embeds is None:
                if self.t5_params is not None:
                    # match the prompt-string path: the uncond branch is the
                    # T5 encoding of the (default-empty) negative prompt,
                    # NOT a zeros context (very different cross-attn K/V)
                    negative_prompt_embeds = self.encode_texts(
                        [negative_prompt or ""] * int(batch))
                else:
                    raise ValueError(
                        "prompt_embeds without negative_prompt_embeds needs "
                        "a T5 encoder on the pipeline to encode the negative"
                        " prompt; pass both embeds to skip T5 entirely")
            context = jnp.concatenate(
                [negative_prompt_embeds, prompt_embeds], axis=0).astype(dtype)
        elif prompt is None:
            raise ValueError("provide `prompt` or `prompt_embeds`")
        else:
            batch = 1 if isinstance(prompt, str) else len(prompt)
            context = self.encode_prompt(prompt, negative_prompt).astype(dtype)

        _mark("text_encode")
        if clip_fea is None and clip_image is not None:
            if self.clip_params is None:
                raise ValueError("clip_image given but pipeline has no "
                                 "clip_params (CLIP vision tower)")
            from versecrafter_tpu.models.clip import encode_image
            clip_fea = encode_image(self.clip_params, self.clip_cfg, clip_image)
            clip_fea = jnp.broadcast_to(
                clip_fea, (batch, *clip_fea.shape[1:]))
        extras = {}
        if y is not None:
            extras["y"] = jnp.asarray(y, dtype)
        if clip_fea is not None:
            extras["clip_fea"] = jnp.asarray(clip_fea, dtype)
        if camera_video is not None:
            if "control_adapter" not in self.dit_params:
                raise ValueError(
                    "camera_video given but the DiT has no control_adapter "
                    "(checkpoint lacks SimpleAdapter weights / "
                    "cfg.add_control_adapter is off)")
            extras["y_camera"] = jnp.asarray(camera_video, dtype)

        n_ref = 0
        if geoada_context is None:
            if control_videos is None and video is not None:
                # masked init-video conditioning (reference :793-807): zero
                # out the to-generate region in [-1,1] space. encode_controls
                # normalizes v*2-1 internally, so fold the mask as
                # v*keep + 0.5*(1-keep) (0.5 in [0,1] == 0 in [-1,1]).
                if mask_video is None:
                    raise ValueError("video= conditioning needs mask_video")
                keep = (np.asarray(mask_video, np.float32) < 0.5).astype(
                    np.float32)
                v = np.asarray(video, np.float32)
                control_videos = [v * keep + 0.5 * (1.0 - keep)]
            if control_videos is None:
                raise ValueError(
                    "need control_videos, video or geoada_context")
            if mask_video is None:
                mask_video = np.ones(
                    (batch, 1, num_frames, height, width), np.float32)
            geoada_context, n_ref = self.encode_controls(
                control_videos, mask_video, dtype,
                subject_ref_images=subject_ref_images)
        _mark("encode_controls")

        t_lat = geoada_context.shape[2]
        h_lat = height // self.vae_cfg.spatial_compression_ratio
        w_lat = width // self.vae_cfg.spatial_compression_ratio
        pt, ph, pw = self.dit_cfg.patch_size
        grid_f, grid_h, grid_w = t_lat // pt, h_lat // ph, w_lat // pw
        seq_len = grid_f * grid_h * grid_w
        cos, sin = grid_cos_sin(self._angles, grid_f, grid_h, grid_w)

        sched = make_scheduler(self.scheduler_name, self.scheduler_cfg)
        if timesteps is not None:
            timesteps = sched.set_custom_timesteps(timesteps)
            num_inference_steps = sched.num_inference_steps
        else:
            timesteps = sched.set_timesteps(num_inference_steps, shift=shift)

        lat_shape = (batch, self.vae_cfg.z_dim, t_lat, h_lat, w_lat)
        if latents is None:
            latents = jax.random.normal(jax.random.key(seed), lat_shape, dtype)
        else:
            if tuple(latents.shape) != lat_shape:
                raise ValueError(
                    f"latents= shape {tuple(latents.shape)} != expected "
                    f"{lat_shape}")
            latents = jnp.asarray(latents, dtype)

        do_cfg = guidance_scale > 1.0
        seq_cfg = do_cfg and not self.cfg_parallel
        tea_batch = 2 * batch if (do_cfg and not seq_cfg) else batch
        # disabled TeaCache: zero-length states, not [B, S, D] ones — the
        # state rides the jitted step as an argument either way, and at
        # 75,600 tok the two sequential-CFG prev_residuals alone were
        # 1.48 GB of pointless HBM arguments on the 720p 14B step
        recording = getattr(self, "teacache_record", None) is not None
        # host-gated TeaCache for big-sequence sequential CFG: the decision
        # moves to host (tc.host_gate) and the residual cache rides two
        # small programs instead of one lax.cond program (tc.TEA_HOST_GATE_ROWS)
        tea_host = (seq_cfg and self.teacache_threshold > 0 and not recording
                    and batch * seq_len > tc.TEA_HOST_GATE_ROWS)
        tea_seq = seq_len if ((self.teacache_threshold > 0 and not tea_host)
                              or recording) else 0
        if recording and tea_batch * seq_len > tc.TEA_RECORD_SUBSAMPLE_ROWS:
            # the record pass only REDUCES the residual (rel-L1 drift), so
            # its state tracks a strided row subset — the full-resolution
            # record state pushed the 14B 720p step 99 MB past the v5e HBM
            # (see teacache.TEA_RECORD_SUBSAMPLE_ROWS)
            tea_seq = -(-seq_len // tc.RECORD_SUBSAMPLE_STRIDE)
        tea_state = tc.init_state(tea_batch, tea_seq, self.dit_cfg.dim, dtype)
        tea_state = self._shard_tea_state(tea_state)
        tea_state_u = (self._shard_tea_state(
            tc.init_state(batch, tea_seq, self.dit_cfg.dim, dtype))
            if seq_cfg else None)
        # sequential CFG reuses the cond-only compiled program (which reads
        # the SECOND half of context) for both branches: [pos, neg] ordering
        # makes its second-half slice pick the negative prompts
        context_sw = (jnp.concatenate([context[batch:], context[:batch]])
                      if seq_cfg else None)
        if tea_host:
            tea_hosts = {"c": tc.HostTeaState(batch, self.dit_cfg.dim),
                         "u": tc.HostTeaState(batch, self.dit_cfg.dim)}
            tea_residuals = {"c": None, "u": None}
        if self.teacache_debug:
            # per-generation snapshots — without the reset a resident server
            # pipeline accumulates stale cross-request history unboundedly
            self.teacache_accum_history = []
        skip_from = num_inference_steps * (1.0 - self.cfg_skip_ratio)

        guidance = jnp.asarray(guidance_scale, jnp.float32)
        gscale = jnp.asarray(geoada_context_scale, jnp.float32)

        with self._mesh_ctx():
            for i, t in enumerate(timesteps):
                use_cfg = do_cfg and not (
                    self.cfg_skip_ratio > 0.0 and i >= skip_from)
                if not seq_cfg and use_cfg != (
                        tc.res_shape(tea_state)[0] == 2 * batch):
                    # entering the cfg-skip window: keep the cond half of the
                    # cache (per-row accum/valid slice with it)
                    tea_state = self._shard_tea_state(tc.TeaCacheState(
                        prev_mod=tea_state.prev_mod[-batch:],
                        prev_residual=jax.tree_util.tree_map(
                            lambda r: r[-batch:], tea_state.prev_residual),
                        accum=tea_state.accum[-batch:],
                        valid=tea_state.valid[-batch:]))
                # Wan2.2 MoE expert selection by noise level (sigma = t / T)
                sigma = float(t) / self.scheduler_cfg.num_train_timesteps
                if self.expert_swap is not None:
                    want = "high" if sigma >= self.moe_boundary else "low"
                    if getattr(self, "_resident_expert", None) != want:
                        # drop the old expert BEFORE building the new one —
                        # both never coexist (the point of staged MoE)
                        self.dit_params = None
                        import gc as _gc
                        _gc.collect()
                        self.dit_params = self.expert_swap(want)
                        self._resident_expert = want
                use_high = (self.dit_params_high is not None
                            and sigma >= self.moe_boundary)
                dit_params = self.dit_params_high if use_high else self.dit_params
                # np scalars ride the jit call's own transfer — an eager
                # jnp.asarray would be one extra device round trip per step
                if seq_cfg and tea_host:
                    ke = tuple(sorted(extras))
                    e0_np = np.asarray(self._e0_fn()(
                        dit_params, np.full((batch,), float(t), np.float32)))

                    def _branch(name, ctx_in):
                        # e0 depends only on t, so both branches see the
                        # same metric; states still advance independently
                        # (cfg-skip freezes the uncond branch's state)
                        calc = bool(tc.host_gate(
                            tea_hosts[name], e0_np, i,
                            self.teacache_threshold,
                            self.teacache_skip_start,
                            self.teacache_coefficients).any()) \
                            or tea_residuals[name] is None
                        fn = self._get_denoise_hostgated(calc, key_extra=ke)
                        if calc:
                            # drop the stale residual BEFORE dispatch — the
                            # calc program doesn't read it, and old+new
                            # caches must not coexist in the HBM budget
                            tea_residuals[name] = None
                            pred, fresh = fn(
                                dit_params, latents, np.float32(float(t)),
                                ctx_in, geoada_context, cos, sin, None,
                                gscale, extras)
                            # strict serialization (axon allocator lesson):
                            # the residual program's temps must not queue
                            # while the big step still holds its working set
                            pred.block_until_ready()
                            tea_residuals[name] = self._get_residual_hostgated(
                                key_extra=ke)(
                                dit_params, latents, np.float32(float(t)),
                                ctx_in, fresh, extras)
                            # drain before the next big program dispatches:
                            # queued programs count toward the HBM budget,
                            # and this one pins `fresh` (0.77 GB) until done
                            jax.block_until_ready(tea_residuals[name])
                            del fresh
                            return pred
                        return fn(
                            dit_params, latents, np.float32(float(t)),
                            ctx_in, geoada_context, cos, sin,
                            tea_residuals[name], gscale, extras)

                    noise_pred = _branch("c", context)
                    if use_cfg:
                        noise_pred.block_until_ready()
                        pred_u = _branch("u", context_sw)
                        noise_pred = self._cfg_combine()(
                            pred_u, noise_pred, guidance)
                    if self.teacache_debug:
                        self.teacache_accum_history.append(
                            tea_hosts["c"].accum.copy())
                elif seq_cfg:
                    fn = self._get_denoise(
                        False, key_extra=tuple(sorted(extras)))
                    noise_pred, tea_state = fn(
                        dit_params, latents, np.float32(float(t)),
                        np.int32(i), context, geoada_context, cos, sin,
                        tea_state, guidance, gscale, extras)
                    if use_cfg:
                        # serialize the two halves: queued programs' working
                        # sets COEXIST in the axon allocator's budget, and
                        # halving that footprint is the entire point of
                        # sequential CFG
                        noise_pred.block_until_ready()
                        pred_u, tea_state_u = fn(
                            dit_params, latents, np.float32(float(t)),
                            np.int32(i), context_sw, geoada_context, cos, sin,
                            tea_state_u, guidance, gscale, extras)
                        noise_pred = self._cfg_combine()(
                            pred_u, noise_pred, guidance)
                else:
                    fn = self._get_denoise(
                        use_cfg, key_extra=tuple(sorted(extras)))
                    noise_pred, tea_state = fn(
                        dit_params, latents, np.float32(float(t)),
                        np.int32(i), context, geoada_context, cos, sin,
                        tea_state, guidance, gscale, extras)
                if self.teacache_record is not None:
                    self.teacache_record.append(
                        (np.asarray(tea_state.prev_mod),
                         np.asarray(tea_state.accum)))
                if (self.teacache_debug and self.teacache_threshold > 0.0
                        and not tea_host):
                    self.teacache_accum_history.append(
                        np.asarray(tea_state.accum))
                latents = sched.step(noise_pred, i, latents)
                if callback_on_step_end is not None:
                    out = callback_on_step_end(
                        self, i, float(t), {"latents": latents})
                    if out:
                        latents = out.pop("latents", latents)
                if progress is not None:
                    progress(i + 1, num_inference_steps)

        # the loop dispatches async — sync before closing the denoise span
        # so decode/download don't absorb queued step time
        latents.block_until_ready()
        _mark("denoise")
        if n_ref:  # strip the prepended reference-frame slots (pipeline:927-930)
            latents = latents[:, :, n_ref:]
        if output_type == "latent":
            self.last_wall_profile = {k: round(v, 2) for k, v in wall.items()}
            return latents
        out = self.decode_latents(latents, output_type, _mark=_mark)
        self.last_wall_profile = {k: round(v, 2) for k, v in wall.items()}
        return out

    def decode_latents(self, latents, output_type: str = "numpy",
                       _mark=lambda name: None) -> np.ndarray:
        """VAE-decode latents -> frames [B, T, H, W, 3] (the tail of
        __call__, public for the staged-residency driver which swaps the
        DiT out for the VAE before decoding — reference decode_latents,
        pipeline_wan_versecrafter.py:550-555)."""
        latents = self._shard_vae_input(latents)
        out_voxels = (np.prod(latents.shape[2:])
                      * self.vae_cfg.temporal_compression_ratio
                      * self.vae_cfg.spatial_compression_ratio ** 2)
        if latents.shape[2] > 1 and out_voxels > self.VAE_STREAM_THRESHOLD:
            return self._decode_stream_overlapped(latents, output_type,
                                                  _mark)
        else:
            key = ("vae_decode",)
            if key not in self._jit_cache:
                vcfg = self.vae_cfg
                self._jit_cache[key] = jax.jit(lambda p, z: jnp.clip(
                    vae_decode(p, vcfg, z).astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0))
            video = self._jit_cache[key](self.vae_params, latents)
        if output_type == "uint8":
            # quantize ON DEVICE: the final video is the largest host
            # transfer of the whole generation (900 MB f32 at 720p x 81f
            # through a remote-device tunnel) — same truncation semantics
            # as utils.video.save_video's float path
            video = (jnp.clip(video, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        video.block_until_ready()
        _mark("vae_decode")
        out = np.asarray(video.transpose(0, 2, 3, 4, 1))
        _mark("download")
        return out

    def _finalize_pixels_fn(self, output_type: str):
        key = ("vae_finalize", output_type)
        if key not in self._jit_cache:
            if output_type == "uint8":
                self._jit_cache[key] = jax.jit(lambda y: (jnp.clip(
                    y.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
                    * 255.0).astype(jnp.uint8))
            else:
                self._jit_cache[key] = jax.jit(lambda y: jnp.clip(
                    y.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0))
        return self._jit_cache[key]

    def _decode_stream_overlapped(self, latents, output_type: str,
                                  _mark=lambda name: None) -> np.ndarray:
        """Streaming decode with chunk downloads OVERLAPPED: chunk N
        downloads on a worker thread while chunk N+1 decodes (the same
        pattern as geometry/render.py's batch loop — device programs stay
        strictly serialized via block_until_ready, only the host transfer
        overlaps; on the 19 MB/s axon tunnel the download otherwise
        serializes behind ~seconds of decode)."""
        import queue as queuelib
        import threading

        from versecrafter_tpu.models.vae_stream import vae_decode_stream

        finalize = self._finalize_pixels_fn(output_type)
        chunks: list = []
        err: list = []
        q: "queuelib.Queue" = queuelib.Queue(maxsize=2)

        def downloader():
            while True:
                item = q.get()
                if item is None:
                    return
                try:
                    chunks.append(np.asarray(item.transpose(0, 2, 3, 4, 1)))
                except Exception as e:  # noqa: BLE001 — re-raised by caller
                    err.append(e)
                finally:
                    q.task_done()

        worker = threading.Thread(target=downloader, daemon=True)
        worker.start()
        try:
            for yc in vae_decode_stream(self.vae_params, self.vae_cfg,
                                        latents):
                u = finalize(yc)
                u.block_until_ready()  # retire before the next chunk queues
                q.put(u)
        finally:
            q.put(None)
            worker.join()
        if err:
            raise err[0]
        _mark("vae_decode")
        out = np.concatenate(chunks, axis=1)
        _mark("download")
        return out
