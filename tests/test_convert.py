"""Checkpoint conversion tests.

No real Wan weights ship in this environment, so these tests build synthetic
state dicts in the torch checkpoint layout (names + torch shape conventions)
from our own params, run the converter, and require (a) exact tree equality
and (b) identical forward outputs — validating the name mapping and every
transpose/reshape in both directions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig
from versecrafter_tpu.core.convert import (
    convert_wan_dit, convert_wan_t5, convert_wan_vae)
from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward

CFG = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32, text_dim=24,
                   out_dim=4, num_heads=4, num_layers=2, text_len=8,
                   geoada_layers=(), geoada_in_dim=6)


def _lin_t(p):  # our [in,out] -> torch [out,in]
    return {"weight": np.asarray(p["kernel"]).T, "bias": np.asarray(p["bias"])}


def _attn_to_torch(sd, prefix, p):
    for n in ("q", "k", "v", "o"):
        t = _lin_t(p[n])
        sd[f"{prefix}.{n}.weight"] = t["weight"]
        sd[f"{prefix}.{n}.bias"] = t["bias"]
    sd[f"{prefix}.norm_q.weight"] = np.asarray(p["norm_q"]["scale"])
    sd[f"{prefix}.norm_k.weight"] = np.asarray(p["norm_k"]["scale"])


def _dit_to_torch_layout(params, cfg):
    sd = {}
    pe = np.asarray(params["patch_embedding"]["kernel"]).T  # [D, C*p]
    pt, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = pe.reshape(cfg.dim, cfg.in_dim, pt, ph, pw)
    sd["patch_embedding.bias"] = np.asarray(params["patch_embedding"]["bias"])
    for ours, theirs in (("text_embedding", "text_embedding"),
                         ("time_embedding", "time_embedding")):
        for fc, idx in (("fc1", 0), ("fc2", 2)):
            t = _lin_t(params[ours][fc])
            sd[f"{theirs}.{idx}.weight"] = t["weight"]
            sd[f"{theirs}.{idx}.bias"] = t["bias"]
    t = _lin_t(params["time_projection"])
    sd["time_projection.1.weight"] = t["weight"]
    sd["time_projection.1.bias"] = t["bias"]
    t = _lin_t(params["head"]["head"])
    sd["head.head.weight"] = t["weight"]
    sd["head.head.bias"] = t["bias"]
    sd["head.modulation"] = np.asarray(params["head"]["modulation"])[None]

    for i in range(cfg.num_layers):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        pre = f"blocks.{i}"
        _attn_to_torch(sd, f"{pre}.self_attn", bp["self_attn"])
        _attn_to_torch(sd, f"{pre}.cross_attn", bp["cross_attn"])
        for fc, idx in (("ffn_in", 0), ("ffn_out", 2)):
            t = _lin_t(bp[fc])
            sd[f"{pre}.ffn.{idx}.weight"] = t["weight"]
            sd[f"{pre}.ffn.{idx}.bias"] = t["bias"]
        sd[f"{pre}.modulation"] = np.asarray(bp["modulation"])[None]
        sd[f"{pre}.norm3.weight"] = np.asarray(bp["norm3"]["scale"])
        sd[f"{pre}.norm3.bias"] = np.asarray(bp["norm3"]["bias"])

    for n in range(len(cfg.resolved_geoada_layers)):
        gp = jax.tree.map(lambda a: a[n], params["geoada_blocks"])
        pre = f"geoada_blocks.{n}"
        _attn_to_torch(sd, f"{pre}.self_attn", gp["self_attn"])
        _attn_to_torch(sd, f"{pre}.cross_attn", gp["cross_attn"])
        for fc, idx in (("ffn_in", 0), ("ffn_out", 2)):
            t = _lin_t(gp[fc])
            sd[f"{pre}.ffn.{idx}.weight"] = t["weight"]
            sd[f"{pre}.ffn.{idx}.bias"] = t["bias"]
        sd[f"{pre}.modulation"] = np.asarray(gp["modulation"])[None]
        sd[f"{pre}.norm3.weight"] = np.asarray(gp["norm3"]["scale"])
        sd[f"{pre}.norm3.bias"] = np.asarray(gp["norm3"]["bias"])
        t = _lin_t(gp["after_proj"])
        sd[f"{pre}.after_proj.weight"] = t["weight"]
        sd[f"{pre}.after_proj.bias"] = t["bias"]
    t = _lin_t(params["geoada_before_proj"])
    sd["geoada_blocks.0.before_proj.weight"] = t["weight"]
    sd["geoada_blocks.0.before_proj.bias"] = t["bias"]
    gpe = np.asarray(params["geoada_patch_embedding"]["kernel"]).T
    sd["geoada_patch_embedding.weight"] = gpe.reshape(
        cfg.dim, cfg.resolved_geoada_in_dim, pt, ph, pw)
    sd["geoada_patch_embedding.bias"] = np.asarray(
        params["geoada_patch_embedding"]["bias"])
    return sd


def test_dit_conversion_roundtrip():
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    sd = _dit_to_torch_layout(params, CFG)
    conv, report = convert_wan_dit(sd, CFG, jnp.float32)
    assert not report["skipped"], report
    assert not report["unused"], report["unused"][:5]

    # tree equality
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(conv)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))

    # forward equality
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 6, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 24)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(12, max_pos=32))
    cos, sin = grid_cos_sin(ang, 2, 4, 4)
    t = jnp.asarray([500.0])
    o1 = wan_dit_forward(params, CFG, x, t, ctx, cos, sin, geoada_context=g)
    o2 = wan_dit_forward(conv, CFG, x, t, ctx, cos, sin, geoada_context=g)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dit_conversion_geoada_in_dim_mismatch_reinits():
    """When the requested geoada_in_dim differs from the checkpoint, the
    patch embedding reinitializes instead of failing (reference behavior)."""
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    sd = _dit_to_torch_layout(params, CFG)
    cfg2 = dataclasses.replace(CFG, geoada_in_dim=10)
    conv, report = convert_wan_dit(sd, cfg2, jnp.float32)
    assert conv["geoada_patch_embedding"]["kernel"].shape == (10 * 4, CFG.dim)
    assert any("geoada_patch_embedding" in s for s in report["skipped"])


VCFG = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                 temporal_downsample=(True,), spatial_compression_ratio=2,
                 temporal_compression_ratio=2, use_latent_stats=False)


def _vae_to_torch_layout(params, cfg):
    sd = {}

    def conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def res(prefix, p):
        sd[f"{prefix}.residual.0.gamma"] = np.asarray(p["norm1"]["gamma"]).reshape(-1, 1, 1, 1)
        conv(f"{prefix}.residual.2", p["conv1"])
        sd[f"{prefix}.residual.3.gamma"] = np.asarray(p["norm2"]["gamma"]).reshape(-1, 1, 1, 1)
        conv(f"{prefix}.residual.6", p["conv2"])
        if "shortcut" in p:
            conv(f"{prefix}.shortcut", p["shortcut"])

    def attn(prefix, p):
        sd[f"{prefix}.norm.gamma"] = np.asarray(p["norm"]["gamma"]).reshape(-1, 1, 1)
        sd[f"{prefix}.to_qkv.weight"] = np.asarray(p["qkv"]["kernel"]).T[..., None, None]
        sd[f"{prefix}.to_qkv.bias"] = np.asarray(p["qkv"]["bias"])
        sd[f"{prefix}.proj.weight"] = np.asarray(p["proj"]["kernel"]).T[..., None, None]
        sd[f"{prefix}.proj.bias"] = np.asarray(p["proj"]["bias"])

    enc = params["encoder"]
    conv("encoder.conv1", enc["conv_in"])
    idx = 0
    for i, st in enumerate(enc["stages"]):
        for rp in st["res"]:
            res(f"encoder.downsamples.{idx}", rp)
            idx += 1
        if "down" in st:
            conv(f"encoder.downsamples.{idx}.resample.1", st["down"]["conv"])
            if "time_conv" in st["down"]:
                conv(f"encoder.downsamples.{idx}.time_conv", st["down"]["time_conv"])
            idx += 1
    res("encoder.middle.0", enc["mid"]["res1"])
    attn("encoder.middle.1", enc["mid"]["attn"])
    res("encoder.middle.2", enc["mid"]["res2"])
    sd["encoder.head.0.gamma"] = np.asarray(enc["norm_out"]["gamma"]).reshape(-1, 1, 1, 1)
    conv("encoder.head.2", enc["conv_out"])
    conv("conv1", enc["quant_conv"])

    dec = params["decoder"]
    conv("conv2", dec["post_quant_conv"])
    conv("decoder.conv1", dec["conv_in"])
    res("decoder.middle.0", dec["mid"]["res1"])
    attn("decoder.middle.1", dec["mid"]["attn"])
    res("decoder.middle.2", dec["mid"]["res2"])
    idx = 0
    for i, st in enumerate(dec["stages"]):
        for rp in st["res"]:
            res(f"decoder.upsamples.{idx}", rp)
            idx += 1
        if "up" in st:
            conv(f"decoder.upsamples.{idx}.resample.1", st["up"]["conv"])
            if "time_conv" in st["up"]:
                conv(f"decoder.upsamples.{idx}.time_conv", st["up"]["time_conv"])
            idx += 1
    sd["decoder.head.0.gamma"] = np.asarray(dec["norm_out"]["gamma"]).reshape(-1, 1, 1, 1)
    conv("decoder.head.2", dec["conv_out"])
    return sd


def test_vae_conversion_roundtrip():
    from versecrafter_tpu.models.vae import init_vae, vae_decode, vae_encode

    params = init_vae(jax.random.key(0), VCFG, jnp.float32)
    sd = _vae_to_torch_layout(params, VCFG)
    conv, report = convert_wan_vae(sd, VCFG, jnp.float32)
    assert not report["skipped"], report
    assert not report["unused"], report["unused"][:5]

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 5, 8, 8)),
                    jnp.float32)
    z1 = vae_encode(params, VCFG, x)
    z2 = vae_encode(conv, VCFG, x)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    y1 = vae_decode(params, VCFG, z1)
    y2 = vae_decode(conv, VCFG, z2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_t5_wan_layout_conversion():
    cfg = T5Config(vocab=64, dim=16, dim_attn=16, dim_ffn=32, num_heads=2,
                   num_layers=2, num_buckets=8, text_length=8)
    rng = np.random.default_rng(0)
    sd = {
        "token_embedding.weight": rng.standard_normal((64, 16)).astype(np.float32),
        "norm.weight": np.ones(16, np.float32),
    }
    for i in range(2):
        pre = f"blocks.{i}"
        for n in ("q", "k", "v", "o"):
            sd[f"{pre}.attn.{n}.weight"] = rng.standard_normal((16, 16)).astype(np.float32)
        sd[f"{pre}.pos_embedding.embedding.weight"] = rng.standard_normal((8, 2)).astype(np.float32)
        sd[f"{pre}.norm1.weight"] = np.ones(16, np.float32)
        sd[f"{pre}.norm2.weight"] = np.ones(16, np.float32)
        sd[f"{pre}.ffn.gate.0.weight"] = rng.standard_normal((32, 16)).astype(np.float32)
        sd[f"{pre}.ffn.fc1.weight"] = rng.standard_normal((32, 16)).astype(np.float32)
        sd[f"{pre}.ffn.fc2.weight"] = rng.standard_normal((16, 32)).astype(np.float32)

    params, report = convert_wan_t5(sd, cfg, jnp.float32)
    assert not report["unused"], report["unused"]
    from versecrafter_tpu.models.t5 import t5_encode

    ids = jnp.asarray(rng.integers(0, 64, (1, 8)))
    out = t5_encode(params, cfg, ids)
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
