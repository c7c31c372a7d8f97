"""Staged weight residency + sequential CFG (sampling/staged.py).

The single-16GB-chip path for the 14B flagship: components resident one at
a time, quantized DiT built incrementally, CFG run as two batch-1 passes.
Validated at tiny scale against the ordinary always-resident pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig
from versecrafter_tpu.models.t5 import init_t5
from versecrafter_tpu.models.vae import init_vae
from versecrafter_tpu.models.wan_dit import (
    init_wan_dit, init_wan_dit_quantized)
from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline
from versecrafter_tpu.sampling.staged import (
    StageFactories, fresh_init_factories, generate_staged)
from versecrafter_tpu.utils import quantize as qz

VAE_CFG = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temporal_downsample=(True,), spatial_compression_ratio=2,
                    temporal_compression_ratio=2, use_latent_stats=False)
T5_CFG = T5Config(vocab=256, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                  num_layers=2, num_buckets=8, text_length=16)
DIT_CFG = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=32, out_dim=4, num_heads=2, num_layers=4,
                       text_len=16, geoada_layers=(), geoada_in_dim=12)


def _live_dit_params():
    p = init_wan_dit(jax.random.key(0), DIT_CFG, jnp.float32)
    p["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(99),
                          p["head"]["head"]["kernel"].shape) * 0.05)
    return p


def _components():
    return (_live_dit_params(),
            init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
            init_t5(jax.random.key(2), T5_CFG, jnp.float32))


def _controls(n=2, t=5, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.random((1, 3, t, h, w)).astype(np.float32) for _ in range(n)]


def _mask(t=5, h=8, w=8):
    m = np.zeros((1, 1, t, h, w), np.float32)
    m[:, :, :, 2:6, 2:6] = 1.0
    return m


def _gen_kwargs():
    return dict(control_videos=_controls(), mask_video=_mask(),
                height=8, width=8, num_frames=5, num_inference_steps=4,
                guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)


def test_sequential_cfg_matches_batched():
    """cfg_parallel=False (two batch-1 passes of the cond-only program)
    reproduces the batched CFG forward: same math, different batching."""
    dit, vae, t5 = _components()
    mk = lambda par: VerseCrafterPipeline(
        dit_params=dit, dit_cfg=DIT_CFG, vae_params=vae, vae_cfg=VAE_CFG,
        t5_params=t5, t5_cfg=T5_CFG, scheduler_name="unipc",
        cfg_parallel=par)
    a = mk(True)("a car", negative_prompt="static", **_gen_kwargs())
    b = mk(False)("a car", negative_prompt="static", **_gen_kwargs())
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_sequential_cfg_with_teacache_and_cfg_skip():
    """The per-branch TeaCache states + cfg-skip window compose with
    sequential CFG (the skip window just stops the uncond pass)."""
    dit, vae, t5 = _components()
    pipe = VerseCrafterPipeline(
        dit_params=dit, dit_cfg=DIT_CFG, vae_params=vae, vae_cfg=VAE_CFG,
        t5_params=t5, t5_cfg=T5_CFG, scheduler_name="unipc",
        cfg_parallel=False)
    pipe.enable_teacache(0.05, skip_start=1)
    pipe.enable_cfg_skip(0.5)
    out = pipe("a car", negative_prompt="static", **_gen_kwargs())
    assert out.shape == (1, 5, 8, 8, 3)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("bits,int8_compute", [(8, False), (4, True)])
def test_init_wan_dit_quantized_matches_eager(bits, int8_compute,
                                              monkeypatch):
    """Incremental on-device quantized build == quantize_tree of the eager
    init, leaf for leaf (same key schedule)."""
    monkeypatch.setattr(qz, "MIN_SIZE", 1 << 10)
    cfg = dataclasses.replace(DIT_CFG, dim=128, ffn_dim=256, num_heads=4)
    key = jax.random.key(3)
    gs = 0 if (bits == 4 and int8_compute) else None
    eager = qz.quantize_tree(init_wan_dit(key, cfg, jnp.float32),
                             bits=bits, group_size=gs)
    if int8_compute:
        eager = qz.tag_int8_compute(eager)
    inc = init_wan_dit_quantized(key, cfg, jnp.float32, bits=bits,
                                 int8_compute=int8_compute)
    flat_e = jax.tree_util.tree_flatten_with_path(eager)[0]
    flat_i = jax.tree_util.tree_flatten_with_path(inc)[0]
    assert len(flat_e) == len(flat_i)
    quantized_leaves = 0
    for (pe, le), (pi, li) in zip(flat_e, flat_i):
        assert pe == pi
        assert le.shape == li.shape and le.dtype == li.dtype, pe
        le, li = np.asarray(le), np.asarray(li)
        names = "/".join(str(getattr(p, "key", p)) for p in pe)
        if "qvalues" in names or "q4values" in names:
            quantized_leaves += 1
            # a scale ULP can flip a round() on the boundary: allow +-1 code
            assert np.abs(le.astype(np.int32)
                          - li.astype(np.int32)).max() <= 1, names
        else:
            # jit rewrites x/c -> x*(1/c) etc.: ULP-level only
            np.testing.assert_allclose(le, li, rtol=1e-5, atol=1e-7,
                                       err_msg=names)
    assert quantized_leaves >= cfg.num_layers  # quantization actually ran


def test_generate_staged_matches_resident():
    """The staged driver (load -> use -> free per component) produces the
    SAME video as the always-resident pipeline when the factories hand it
    the same parameters."""
    dit, vae, t5 = _components()
    resident = VerseCrafterPipeline(
        dit_params=dit, dit_cfg=DIT_CFG, vae_params=vae, vae_cfg=VAE_CFG,
        t5_params=t5, t5_cfg=T5_CFG, scheduler_name="unipc")
    ref = resident("a car", negative_prompt="static", **_gen_kwargs())

    shell = VerseCrafterPipeline(
        dit_params=None, dit_cfg=DIT_CFG, vae_params=None, vae_cfg=VAE_CFG,
        t5_params=None, t5_cfg=T5_CFG, scheduler_name="unipc",
        cfg_parallel=False)
    kw = _gen_kwargs()
    controls, mask = kw.pop("control_videos"), kw.pop("mask_video")
    out = generate_staged(
        shell, StageFactories(lambda: t5, lambda: vae, lambda: dit),
        "a car", negative_prompt="static", control_videos=controls,
        mask_video=mask, output_type="numpy", **kw)
    assert shell.t5_params is None and shell.dit_params is None
    prof = shell.last_stage_profile
    for stage in ("t5_build", "t5_encode", "encode_controls", "dit_build",
                  "denoise", "vae_rebuild", "decode"):
        assert stage in prof, prof
    # sequential CFG => tiny batching-order float diffs only
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_record_pass_latents_decode_to_the_ungated_video():
    """generate_staged(record_teacache=True) keeps the record trajectory's
    final latents on the pipeline (pipe.last_record_latents) — decoding
    them equals the ungated generation, so the 14B/720p fit-then-fire run
    gets its first video from the record pass instead of a second full
    denoise (cli/inference.py fit_teacache path)."""
    dit, vae, t5 = _components()
    resident = VerseCrafterPipeline(
        dit_params=dit, dit_cfg=DIT_CFG, vae_params=vae, vae_cfg=VAE_CFG,
        t5_params=t5, t5_cfg=T5_CFG, scheduler_name="unipc",
        cfg_parallel=False)
    ref = resident("a car", negative_prompt="static", output_type="numpy",
                   **_gen_kwargs())

    shell = VerseCrafterPipeline(
        dit_params=None, dit_cfg=DIT_CFG, vae_params=None, vae_cfg=VAE_CFG,
        t5_params=None, t5_cfg=T5_CFG, scheduler_name="unipc",
        cfg_parallel=False)
    kw = _gen_kwargs()
    controls, mask = kw.pop("control_videos"), kw.pop("mask_video")
    rel_e0, rel_res = generate_staged(
        shell, StageFactories(lambda: t5, lambda: vae, lambda: dit),
        "a car", negative_prompt="static", control_videos=controls,
        mask_video=mask, record_teacache=True, **kw)
    assert rel_e0.shape[0] == kw["num_inference_steps"] - 1
    lat = shell.last_record_latents
    assert lat is not None
    shell.vae_params = vae
    video = np.asarray(shell.decode_latents(lat, "numpy"))
    np.testing.assert_allclose(video, ref, atol=2e-4)


def test_fresh_init_factories_tiny_staged_run():
    """fresh_init_factories('tiny') drives a full staged generation with a
    quantized DiT (the flag path the 14B chip run uses, at toy scale)."""
    import versecrafter_tpu.utils.quantize as q

    old = q.MIN_SIZE
    q.MIN_SIZE = 1 << 10
    try:
        factories, dit_cfg, vae_cfg, t5_cfg = fresh_init_factories(
            scale="tiny", bits=4, int8_compute=True, dtype=jnp.float32)
        # tiny geoada_in_dim: 4 controls x 16 z + 64 mask = 128 matches the
        # real VAE config used by fresh_init_factories
        shell = VerseCrafterPipeline(
            dit_params=None, dit_cfg=dit_cfg, vae_params=None,
            vae_cfg=vae_cfg, t5_params=None, t5_cfg=t5_cfg,
            scheduler_name="unipc", cfg_parallel=False)
        rng = np.random.default_rng(0)
        controls = [rng.random((1, 3, 5, 16, 16)).astype(np.float32)
                    for _ in range(4)]
        out = generate_staged(
            shell, factories, "a car",
            control_videos=controls, height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=2.0, shift=3.0, seed=1,
            output_type="numpy", dtype=jnp.float32)
        assert out.shape[0] == 1 and np.isfinite(out).all()
        assert qz.has_quantized is not None  # module sanity
    finally:
        q.MIN_SIZE = old


def test_fresh_init_staged_moe_run():
    """Staged Wan2.2 timestep-MoE (the --moe CLI path): experts build
    lazily at the sigma-boundary crossings, one resident at a time, and
    each expert is built exactly once for a monotone sigma descent."""
    import versecrafter_tpu.utils.quantize as q

    old = q.MIN_SIZE
    q.MIN_SIZE = 1 << 10
    try:
        factories, dit_cfg, vae_cfg, t5_cfg = fresh_init_factories(
            scale="tiny", bits=4, int8_compute=True, dtype=jnp.float32)
        factories_hi, *_ = fresh_init_factories(
            scale="tiny", bits=4, int8_compute=True, dtype=jnp.float32,
            seed=1)
        shell = VerseCrafterPipeline(
            dit_params=None, dit_cfg=dit_cfg, vae_params=None,
            vae_cfg=vae_cfg, t5_params=None, t5_cfg=t5_cfg,
            scheduler_name="unipc", cfg_parallel=False)
        built = []

        def swap(which):
            built.append(which)
            return (factories_hi.dit if which == "high" else factories.dit)()

        shell.expert_swap = swap
        shell.moe_boundary = 0.5
        rng = np.random.default_rng(0)
        controls = [rng.random((1, 3, 5, 16, 16)).astype(np.float32)
                    for _ in range(4)]
        out = generate_staged(
            shell, factories, "a car",
            control_videos=controls, height=16, width=16, num_frames=5,
            num_inference_steps=4, guidance_scale=2.0, shift=3.0, seed=1,
            output_type="numpy", dtype=jnp.float32)
        assert out.shape[0] == 1 and np.isfinite(out).all()
        assert built == ["high", "low"], built
        assert shell.dit_params is None
        assert "dit_build" not in shell.last_stage_profile
    finally:
        q.MIN_SIZE = old
