"""One typed config tree for the whole framework.

The reference scatters configuration over three uncoordinated mechanisms
(argparse flags, OmegaConf YAML with `dict_mapping` remapping, and hard-coded
in-file constant blocks — see /root/reference/inference/versecrafter_inference.py:74-177
and config/wan2.1/wan_civitai.yaml). Here everything is a frozen dataclass;
YAML model configs (same schema as the reference's `wan_civitai.yaml`) load
into these dataclasses via :func:`load_yaml_config`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class WanDiTConfig:
    """Wan video DiT backbone + optional GeoAdapter control branch.

    Field semantics match the reference model config
    (/root/reference/versecrafter/models/wan_transformer3d.py:674-700 and
    wan_transformer3d_versecrafter.py:151-201); the architecture here is a
    TPU-first re-design (dense [B,C,T,H,W] batches, lax.scan over stacked
    block params, hints computed interleaved instead of stacked).
    """

    model_type: str = "t2v"
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    qk_norm: bool = True
    cross_attn_norm: bool = True
    # self-attention sliding window (left, right), -1 = unbounded
    # (wan_transformer3d.py:688, always (-1,-1) in shipped checkpoints)
    window_size: Tuple[int, int] = (-1, -1)
    eps: float = 1e-6
    rope_max_pos: int = 1024
    rope_theta: float = 10000.0
    # GeoAdapter (VerseCrafter) control branch. `geoada_layers=None` means a
    # plain Wan backbone; `geoada_layers=()` auto-selects every 2nd layer as
    # in the reference (wan_transformer3d_versecrafter.py:175).
    geoada_layers: Optional[Tuple[int, ...]] = None
    geoada_in_dim: Optional[int] = None
    # i2v extras
    add_img_emb: bool = False
    img_emb_dim: int = 1280
    # camera-pose control adapter (base-Wan capability the reference imports
    # as videox_fun SimpleAdapter, wan_transformer3d.py:800-804: PixelUnshuffle
    # + conv(kernel=stride=patch_size[1:]) + residual blocks; its output adds
    # to the patch embeddings at :975-977)
    add_control_adapter: bool = False
    in_dim_control_adapter: int = 24
    downscale_factor_control_adapter: int = 8
    control_adapter_residual_blocks: int = 1

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads

    @property
    def resolved_geoada_layers(self) -> Tuple[int, ...]:
        if self.geoada_layers is None:
            return ()
        if len(self.geoada_layers) == 0:
            return tuple(range(0, self.num_layers, 2))
        return tuple(self.geoada_layers)

    @property
    def has_geoadapter(self) -> bool:
        return self.geoada_layers is not None

    @property
    def resolved_geoada_in_dim(self) -> int:
        return self.in_dim if self.geoada_in_dim is None else self.geoada_in_dim


# Published Wan scales (public model cards). The 14B numbers also appear in
# the reference checkpoints' config.json consumed at wan_transformer3d.py:1185.
WAN21_1_3B = WanDiTConfig(dim=1536, ffn_dim=8960, num_heads=12, num_layers=30)
WAN21_14B = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)


def versecrafter_14b(geoada_in_dim: int = 128) -> WanDiTConfig:
    """Wan2.1-T2V-14B + GeoAdapter with 128-channel control latents
    (geoada_in_dim=128, versecrafter_inference.py:150)."""
    return dataclasses.replace(
        WAN21_14B, geoada_layers=(), geoada_in_dim=geoada_in_dim
    )


@dataclass(frozen=True)
class VAEConfig:
    """Wan2.1 3D causal VAE (reference consumes it as `AutoencoderKLWan`,
    wan_civitai.yaml:9-12: temporal 4x, spatial 8x, 16 latent channels)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    dropout: float = 0.0
    temporal_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    # channel-wise latent normalization (Wan2.1 public stats)
    use_latent_stats: bool = True


@dataclass(frozen=True)
class T5Config:
    """umT5-xxl encoder (wan_civitai.yaml:14-26)."""

    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    rel_pos_max_distance: int = 128
    shared_pos: bool = False  # umT5: per-layer relative position bias
    text_length: int = 512
    eps: float = 1e-6


@dataclass(frozen=True)
class SchedulerConfig:
    """Flow-matching sampler settings (wan_civitai.yaml:28-36 plus the
    runtime shift override at versecrafter_inference.py:136-138,257-258)."""

    name: str = "unipc"  # "euler" | "unipc" | "dpm++"
    num_train_timesteps: int = 1000
    shift: float = 16.0
    solver_order: int = 2
    use_dynamic_shifting: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. Unlike the reference's ulysses/ring degrees
    (versecrafter_inference.py:59-62) parallelism here is declarative:
    one mesh, shardings annotated, XLA inserts collectives over ICI."""

    dp: int = 1        # data / CFG-batch parallel
    fsdp: int = 1      # parameter sharding
    sp: int = 1        # sequence (context) parallel
    tp: int = 1        # tensor parallel (heads / ffn)
    # Use the explicit shard_map ring-attention path instead of GSPMD
    # resharding when sp > 1.
    ring_attention: bool = True


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end generation settings (defaults = the reference's canonical
    operating point, README.md:281-295 / versecrafter_inference.py:57-177)."""

    height: int = 480
    width: int = 832
    num_frames: int = 81
    num_inference_steps: int = 30
    guidance_scale: float = 5.0
    shift: float = 16.0
    fps: int = 16
    seed: int = 2025
    geoada_context_scale: float = 1.0
    # acceleration
    teacache_threshold: float = 0.0  # 0 disables; 0.10 for 14B T2V
    teacache_skip_start: int = 5
    cfg_skip_ratio: float = 0.0
    riflex_k: Optional[int] = None


def _sub(d: dict, key: str) -> dict:
    v = d.get(key) or {}
    return dict(v)


def load_yaml_config(path: str) -> dict:
    """Load a reference-format model YAML (e.g. config/wan2.1/wan_civitai.yaml)
    into typed configs. Returns a dict with keys: 'vae', 't5', 'scheduler',
    plus raw sections for anything else ('transformer_additional_kwargs',
    'image_encoder_kwargs', wan2.2 'boundary'/'transformer_combination_type')."""
    with open(path) as f:
        raw = yaml.safe_load(f)

    te = _sub(raw, "text_encoder_kwargs")
    t5 = T5Config(
        vocab=te.get("vocab", 256384),
        dim=te.get("dim", 4096),
        dim_attn=te.get("dim_attn", 4096),
        dim_ffn=te.get("dim_ffn", 10240),
        num_heads=te.get("num_heads", 64),
        num_layers=te.get("num_layers", 24),
        num_buckets=te.get("num_buckets", 32),
        shared_pos=te.get("shared_pos", False),
        text_length=te.get("text_length", 512),
    )

    vk = _sub(raw, "vae_kwargs")
    vae = VAEConfig(
        temporal_compression_ratio=vk.get("temporal_compression_ratio", 4),
        spatial_compression_ratio=vk.get("spatial_compression_ratio", 8),
    )

    sk = _sub(raw, "scheduler_kwargs")
    sched = SchedulerConfig(
        num_train_timesteps=sk.get("num_train_timesteps", 1000),
        shift=sk.get("shift", 5.0),
        use_dynamic_shifting=sk.get("use_dynamic_shifting", False),
    )

    return {
        "vae": vae,
        "t5": t5,
        "scheduler": sched,
        "raw": raw,
    }
