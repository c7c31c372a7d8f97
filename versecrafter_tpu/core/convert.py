"""Torch-checkpoint -> JAX parameter conversion.

The reference loads three torch artifacts (SURVEY.md §5.4): the DiT from
sharded safetensors with meta-device fast path
(/root/reference/versecrafter/models/wan_transformer3d.py:1176-1322, with
geoada_patch_embedding reinit when geoada_in_dim differs,
wan_transformer3d_versecrafter.py:203-252), the VAE from a bare
`Wan2.1_VAE.pth`, and umT5 from `models_t5_umt5-xxl-enc-bf16.pth`
(wan_civitai.yaml:9-16). These converters map those state dicts into this
framework's pytrees:

- torch Linear [out, in] -> kernel [in, out]
- conv3d patch embedding [D, C, pt, ph, pw] -> matmul kernel
  [C*pt*ph*pw, D] (patchify uses the same (c, pt, ph, pw) channel order)
- per-layer block params stacked along a leading layer axis
- size-mismatched keys skipped with a report (reference :1294-1309 semantics)

No torch import is required when state dicts arrive as numpy; tensors are
converted leaf-by-leaf so the 14B model never needs 2x host RAM.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:  # jnp only needed at call time
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


class _SD:
    """State-dict view with access tracking + size-mismatch skipping."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = sd
        self.used = set()
        self.skipped: List[str] = []

    def get(self, name, dtype=None, transpose=False, reshape=None,
            expect=None) -> Optional[np.ndarray]:
        if name not in self.sd:
            return None
        self.used.add(name)
        arr = _np(self.sd[name])
        if transpose:
            arr = arr.T
        if reshape is not None:
            arr = arr.reshape(reshape)
        if expect is not None and tuple(arr.shape) != tuple(expect):
            self.skipped.append(f"{name}: {arr.shape} != {expect}")
            return None
        if dtype is not None:
            arr = jnp.asarray(arr, dtype)
        return arr

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _maybe(dst: dict, key: str, val):
    if val is not None:
        dst[key] = val


# ---------------------------------------------------------------------------
# Wan DiT (+ GeoAdapter)
# ---------------------------------------------------------------------------

def _linear(sd: _SD, prefix: str, dtype, bias=True) -> dict:
    out = {}
    _maybe(out, "kernel", sd.get(f"{prefix}.weight", dtype, transpose=True))
    if bias:
        _maybe(out, "bias", sd.get(f"{prefix}.bias", dtype))
    return out


def _attn(sd: _SD, prefix: str, dtype, img_kv=False) -> dict:
    p = {
        "q": _linear(sd, f"{prefix}.q", dtype),
        "k": _linear(sd, f"{prefix}.k", dtype),
        "v": _linear(sd, f"{prefix}.v", dtype),
        "o": _linear(sd, f"{prefix}.o", dtype),
    }
    nq = sd.get(f"{prefix}.norm_q.weight", jnp.float32)
    nk = sd.get(f"{prefix}.norm_k.weight", jnp.float32)
    if nq is not None:
        p["norm_q"] = {"scale": nq}
    if nk is not None:
        p["norm_k"] = {"scale": nk}
    if img_kv:
        ki = _linear(sd, f"{prefix}.k_img", dtype)
        vi = _linear(sd, f"{prefix}.v_img", dtype)
        if ki:
            p["k_img"] = ki
            p["v_img"] = vi
            nki = sd.get(f"{prefix}.norm_k_img.weight", jnp.float32)
            if nki is not None:
                p["norm_k_img"] = {"scale": nki}
    return p


def _block(sd: _SD, prefix: str, cfg: WanDiTConfig, dtype,
           geoada=False) -> dict:
    p = {
        "self_attn": _attn(sd, f"{prefix}.self_attn", dtype),
        "cross_attn": _attn(sd, f"{prefix}.cross_attn", dtype,
                            img_kv=(cfg.model_type == "i2v" and not geoada)),
        "ffn_in": _linear(sd, f"{prefix}.ffn.0", dtype),
        "ffn_out": _linear(sd, f"{prefix}.ffn.2", dtype),
        "modulation": sd.get(f"{prefix}.modulation", jnp.float32,
                             reshape=(6, cfg.dim)),
    }
    if cfg.cross_attn_norm:
        p["norm3"] = {
            "scale": sd.get(f"{prefix}.norm3.weight", jnp.float32),
            "bias": sd.get(f"{prefix}.norm3.bias", jnp.float32),
        }
    if geoada:
        p["after_proj"] = _linear(sd, f"{prefix}.after_proj", dtype)
    return p


def _stack(blocks: List[dict]):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _convert_simple_adapter(sd: _SD, cfg: WanDiTConfig, dtype) -> dict:
    """videox_fun SimpleAdapter (imported at wan_transformer3d.py:36, built
    :800-804): PixelUnshuffle + Conv2d(kernel=stride=patch_size[1:]) +
    residual_blocks of nn.Sequential(ReLU, Conv3x3, ReLU, Conv3x3) at
    indices block.1 / block.3. Conv2d weight [D, C*ds*ds, kh, kw] flattens
    in the same (c', kh, kw) order simple_adapter's patchify uses; 3x3
    convs map torch OIHW -> HWIO."""
    ca: dict = {
        "conv": {
            "kernel": sd.get("control_adapter.conv.weight", dtype,
                             reshape=(cfg.dim, -1)).T,
            "bias": sd.get("control_adapter.conv.bias", dtype),
        },
        "res": [],
    }

    def _conv3x3(name):
        w = sd.get(f"{name}.weight")  # [O, I, 3, 3] numpy
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
                "bias": sd.get(f"{name}.bias", dtype)}

    i = 0
    while f"control_adapter.residual_blocks.{i}.block.1.weight" in sd.sd:
        ca["res"].append({
            "conv1": _conv3x3(f"control_adapter.residual_blocks.{i}.block.1"),
            "conv2": _conv3x3(f"control_adapter.residual_blocks.{i}.block.3"),
        })
        i += 1
    return ca


def convert_simple_adapter(state_dict: Dict[str, Any], cfg: WanDiTConfig,
                           dtype=None) -> dict:
    """Standalone converter for a bare SimpleAdapter state dict
    (keys prefixed 'control_adapter.')."""
    return _convert_simple_adapter(_SD(state_dict), cfg, dtype or jnp.bfloat16)


def convert_wan_dit(state_dict: Dict[str, Any], cfg: WanDiTConfig,
                    dtype=None) -> Tuple[dict, dict]:
    """-> (params, report{'skipped': [...], 'unused': [...]})."""
    import jax

    dtype = dtype or jnp.bfloat16
    sd = _SD(state_dict)
    pt, ph, pw = cfg.patch_size

    params: dict = {
        "patch_embedding": {
            "kernel": sd.get("patch_embedding.weight", dtype,
                             reshape=(cfg.dim, -1)).T,
            "bias": sd.get("patch_embedding.bias", dtype),
        },
        "text_embedding": {
            "fc1": _linear(sd, "text_embedding.0", dtype),
            "fc2": _linear(sd, "text_embedding.2", dtype),
        },
        "time_embedding": {
            "fc1": _linear(sd, "time_embedding.0", jnp.float32),
            "fc2": _linear(sd, "time_embedding.2", jnp.float32),
        },
        "time_projection": _linear(sd, "time_projection.1", jnp.float32),
        "head": {
            "head": _linear(sd, "head.head", dtype),
            "modulation": sd.get("head.modulation", jnp.float32,
                                 reshape=(2, cfg.dim)),
        },
    }

    params["blocks"] = _stack([
        _block(sd, f"blocks.{i}", cfg, dtype) for i in range(cfg.num_layers)])

    if cfg.has_geoadapter:
        glayers = cfg.resolved_geoada_layers
        gblocks = [_block(sd, f"geoada_blocks.{n}", cfg, dtype, geoada=True)
                   for n in range(len(glayers))]
        params["geoada_before_proj"] = _linear(sd, "geoada_blocks.0.before_proj", dtype)
        params["geoada_blocks"] = _stack(gblocks)
        gpe_w = sd.get("geoada_patch_embedding.weight", dtype,
                       reshape=(cfg.dim, -1),
                       expect=(cfg.dim, cfg.resolved_geoada_in_dim * pt * ph * pw))
        if gpe_w is not None:
            params["geoada_patch_embedding"] = {
                "kernel": gpe_w.T,
                "bias": sd.get("geoada_patch_embedding.bias", dtype),
            }
        else:
            # geoada_in_dim changed vs checkpoint: reinit (reference behavior,
            # wan_transformer3d_versecrafter.py:240-250)
            from versecrafter_tpu.models.wan_dit import _init_linear

            params["geoada_patch_embedding"] = _init_linear(
                jax.random.key(0),
                cfg.resolved_geoada_in_dim * pt * ph * pw, cfg.dim, dtype)

    if "control_adapter.conv.weight" in state_dict:
        params["control_adapter"] = _convert_simple_adapter(sd, cfg, dtype)

    if cfg.model_type == "i2v" and "img_emb.proj.0.weight" in state_dict:
        params["img_emb"] = {
            "norm_in": {"scale": sd.get("img_emb.proj.0.weight", jnp.float32),
                        "bias": sd.get("img_emb.proj.0.bias", jnp.float32)},
            "fc1": _linear(sd, "img_emb.proj.1", dtype),
            "fc2": _linear(sd, "img_emb.proj.3", dtype),
            "norm_out": {"scale": sd.get("img_emb.proj.4.weight", jnp.float32),
                         "bias": sd.get("img_emb.proj.4.bias", jnp.float32)},
        }

    return params, {"skipped": sd.skipped, "unused": sd.unused()}


# ---------------------------------------------------------------------------
# Wan 3D VAE
# ---------------------------------------------------------------------------

def _conv(sd: _SD, prefix: str, dtype) -> dict:
    return {"kernel": sd.get(f"{prefix}.weight", dtype),
            "bias": sd.get(f"{prefix}.bias", dtype)}


def _res(sd: _SD, prefix: str, dtype) -> dict:
    p = {
        "norm1": {"gamma": sd.get(f"{prefix}.residual.0.gamma", jnp.float32,
                                  reshape=(-1,))},
        "conv1": _conv(sd, f"{prefix}.residual.2", dtype),
        "norm2": {"gamma": sd.get(f"{prefix}.residual.3.gamma", jnp.float32,
                                  reshape=(-1,))},
        "conv2": _conv(sd, f"{prefix}.residual.6", dtype),
    }
    if f"{prefix}.shortcut.weight" in sd.sd:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut", dtype)
    return p


def _vattn(sd: _SD, prefix: str, dtype) -> dict:
    # torch stores 1x1 Conv2d [out, in, 1, 1]; our attn uses dense [in, out]
    qkv = sd.get(f"{prefix}.to_qkv.weight", dtype, reshape=None)
    proj = sd.get(f"{prefix}.proj.weight", dtype)
    return {
        "norm": {"gamma": sd.get(f"{prefix}.norm.gamma", jnp.float32,
                                 reshape=(-1,))},
        "qkv": {"kernel": qkv.reshape(qkv.shape[0], qkv.shape[1]).T,
                "bias": sd.get(f"{prefix}.to_qkv.bias", dtype)},
        "proj": {"kernel": proj.reshape(proj.shape[0], proj.shape[1]).T,
                 "bias": sd.get(f"{prefix}.proj.bias", dtype)},
    }


def _conv2(sd: _SD, prefix: str, dtype) -> dict:
    return {"kernel": sd.get(f"{prefix}.weight", dtype),
            "bias": sd.get(f"{prefix}.bias", dtype)}


def convert_wan_vae(state_dict: Dict[str, Any], cfg: VAEConfig = VAEConfig(),
                    dtype=None) -> Tuple[dict, dict]:
    """Maps the Wan VAE torch layout (encoder.conv1/downsamples.N/middle/head,
    decoder.conv1/upsamples.N, conv1/conv2 quant convs).

    Latent-stats convention (check FIRST on any real-weight parity run):
    this repo applies the Wan per-channel latent mean/std INSIDE
    encode()/decode() (models/vae.py use_latent_stats, so pipeline-visible
    latents are always standardized), matching the reference's
    AutoencoderKLWan which stores latents_mean/latents_std in its config
    and normalizes in its own encode/decode wrappers — i.e. the geoada
    control context and the denoised latents see the SAME standardized
    scale. If a weight-run shows a uniform per-channel scale/offset error,
    suspect this placement before the conv weights."""
    dtype = dtype or jnp.float32
    sd = _SD(state_dict)
    nres = cfg.num_res_blocks
    nstages = len(cfg.dim_mult)

    enc: dict = {"conv_in": _conv(sd, "encoder.conv1", dtype)}
    idx = 0
    stages = []
    for i in range(nstages):
        st = {"res": [_res(sd, f"encoder.downsamples.{idx + j}", dtype)
                      for j in range(nres)]}
        idx += nres
        if i != nstages - 1:
            st["down"] = {"conv": _conv2(sd, f"encoder.downsamples.{idx}.resample.1", dtype)}
            if cfg.temporal_downsample[i]:
                st["down"]["time_conv"] = _conv(
                    sd, f"encoder.downsamples.{idx}.time_conv", dtype)
            idx += 1
        stages.append(st)
    enc["stages"] = stages
    enc["mid"] = {
        "res1": _res(sd, "encoder.middle.0", dtype),
        "attn": _vattn(sd, "encoder.middle.1", dtype),
        "res2": _res(sd, "encoder.middle.2", dtype),
    }
    enc["norm_out"] = {"gamma": sd.get("encoder.head.0.gamma", jnp.float32,
                                       reshape=(-1,))}
    enc["conv_out"] = _conv(sd, "encoder.head.2", dtype)
    enc["quant_conv"] = _conv(sd, "conv1", dtype)

    dec: dict = {
        "post_quant_conv": _conv(sd, "conv2", dtype),
        "conv_in": _conv(sd, "decoder.conv1", dtype),
        "mid": {
            "res1": _res(sd, "decoder.middle.0", dtype),
            "attn": _vattn(sd, "decoder.middle.1", dtype),
            "res2": _res(sd, "decoder.middle.2", dtype),
        },
    }
    idx = 0
    ustages = []
    for i in range(nstages):
        st = {"res": [_res(sd, f"decoder.upsamples.{idx + j}", dtype)
                      for j in range(nres + 1)]}
        idx += nres + 1
        if i != nstages - 1:
            st["up"] = {"conv": _conv2(sd, f"decoder.upsamples.{idx}.resample.1", dtype)}
            if cfg.temporal_downsample[::-1][i]:
                st["up"]["time_conv"] = _conv(
                    sd, f"decoder.upsamples.{idx}.time_conv", dtype)
            idx += 1
        ustages.append(st)
    dec["stages"] = ustages
    dec["norm_out"] = {"gamma": sd.get("decoder.head.0.gamma", jnp.float32,
                                       reshape=(-1,))}
    dec["conv_out"] = _conv(sd, "decoder.head.2", dtype)

    return {"encoder": enc, "decoder": dec}, \
        {"skipped": sd.skipped, "unused": sd.unused()}


# ---------------------------------------------------------------------------
# umT5 (Wan t5.py layout; HF layout handled in models/t5.convert_hf_umt5)
# ---------------------------------------------------------------------------

def convert_wan_t5(state_dict: Dict[str, Any], cfg: T5Config,
                   dtype=None) -> Tuple[dict, dict]:
    """Maps the Wan-style umT5 encoder state dict
    (token_embedding / blocks.N.{norm1,attn.{q,k,v,o},pos_embedding,
    norm2,ffn.{gate.0,fc1,fc2}} / norm — the layout of
    models_t5_umt5-xxl-enc-bf16.pth)."""
    dtype = dtype or jnp.bfloat16
    sd = _SD(state_dict)

    def lin(name):
        return sd.get(name, dtype, transpose=True)

    params: dict = {
        "embed": sd.get("token_embedding.weight", dtype),
        "final_norm": sd.get("norm.weight", jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        params["blocks"].append({
            "norm1": sd.get(f"{pre}.norm1.weight", jnp.float32),
            "attn": {
                "q": lin(f"{pre}.attn.q.weight"),
                "k": lin(f"{pre}.attn.k.weight"),
                "v": lin(f"{pre}.attn.v.weight"),
                "o": lin(f"{pre}.attn.o.weight"),
                "rel_bias": sd.get(f"{pre}.pos_embedding.embedding.weight",
                                   jnp.float32),
            },
            "norm2": sd.get(f"{pre}.norm2.weight", jnp.float32),
            "ffn": {
                "wi_0": lin(f"{pre}.ffn.gate.0.weight"),
                "wi_1": lin(f"{pre}.ffn.fc1.weight"),
                "wo": lin(f"{pre}.ffn.fc2.weight"),
            },
        })
    return params, {"skipped": sd.skipped, "unused": sd.unused()}


# ---------------------------------------------------------------------------
# loading helpers
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load .pth / .safetensors / sharded safetensors dir."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        sd: Dict[str, Any] = {}
        from safetensors import safe_open

        for f in files:
            with safe_open(f, framework="np") as st:
                for k in st.keys():
                    sd[k] = st.get_tensor(k)
        return sd
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="np") as st:
            for k in st.keys():
                sd[k] = st.get_tensor(k)
        return sd
    if path.endswith(".npz"):  # numpy-native adapters (e.g. LoRA exports)
        import numpy as np

        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd)


def maybe_load_clip(model_dir: str, dtype=None):
    """Convert the CLIP vision tower when the model dir ships one
    (models_clip_*.pth — image_encoder_subpath,
    config/wan2.1/wan_civitai.yaml:39). Returns (params, cfg) or
    (None, None); load_versecrafter wires the result into the pipeline's
    clip_params so `clip_image=` i2v conditioning works out of the box."""
    import glob as _glob

    ckpts = sorted(_glob.glob(os.path.join(model_dir, "models_clip_*.pth")))
    if not ckpts:
        return None, None
    from versecrafter_tpu.models.clip import convert_clip_vision

    import jax.numpy as _jnp
    return convert_clip_vision(load_torch_state_dict(ckpts[0]),
                               dtype=dtype or _jnp.bfloat16)


def load_versecrafter(model_dir: str, transformer_path: Optional[str] = None,
                      geoada_in_dim: int = 128, dtype=None,
                      scheduler: str = "unipc", tokenizer_path: Optional[str] = None,
                      high_noise_path: Optional[str] = None,
                      moe_boundary: float = 0.875):
    """Build a full pipeline from a reference-layout model directory
    (config.json + safetensors DiT, Wan2.1_VAE.pth,
    models_t5_umt5-xxl-enc-bf16.pth — the layout versecrafter_inference.py
    loads at :188-249).

    Wan2.2 two-expert layout (low_noise_model/ + high_noise_model/ subdirs,
    config/wan2.2/wan_civitai_t2v.yaml:3-8) is auto-detected (or pass
    high_noise_path); the high-noise expert activates for
    sigma >= moe_boundary."""
    from versecrafter_tpu.core.config import T5Config, VAEConfig
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    dtype = dtype or jnp.bfloat16
    tdir = transformer_path or model_dir
    low_dir = os.path.join(tdir, "low_noise_model")
    high_dir = high_noise_path or os.path.join(tdir, "high_noise_model")
    if os.path.isdir(low_dir) and os.path.isdir(high_dir):
        tdir = low_dir
    elif not (high_noise_path and os.path.isdir(high_dir)):
        high_dir = None
    with open(os.path.join(tdir, "config.json")) as f:
        tc = json.load(f)
    cfg = WanDiTConfig(
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
    dit_params, report = convert_wan_dit(load_torch_state_dict(tdir), cfg, dtype)
    if report["skipped"]:
        print(f"convert_wan_dit skipped: {report['skipped'][:8]}")
    dit_params_high = None
    if high_dir:
        dit_params_high, rep_h = convert_wan_dit(
            load_torch_state_dict(high_dir), cfg, dtype)
        if rep_h["skipped"]:
            print(f"convert_wan_dit (high-noise) skipped: {rep_h['skipped'][:8]}")

    vae_cfg = VAEConfig()
    vae_params, _ = convert_wan_vae(
        load_torch_state_dict(os.path.join(model_dir, "Wan2.1_VAE.pth")),
        vae_cfg, jnp.float32)

    t5_cfg = T5Config()
    t5_params, _ = convert_wan_t5(
        load_torch_state_dict(
            os.path.join(model_dir, "models_t5_umt5-xxl-enc-bf16.pth")),
        t5_cfg, dtype)

    from versecrafter_tpu.utils.tokenizer import load_tokenizer

    clip_params, clip_cfg = maybe_load_clip(model_dir, dtype)

    return VerseCrafterPipeline(
        dit_params=dit_params, dit_cfg=cfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        t5_params=t5_params, t5_cfg=t5_cfg,
        tokenizer=load_tokenizer(tokenizer_path or
                                 os.path.join(model_dir, "google/umt5-xxl")),
        scheduler_name=scheduler,
        dit_params_high=dit_params_high,
        moe_boundary=moe_boundary,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
    )
