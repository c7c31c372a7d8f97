"""W8A8 int8 COMPUTE path (utils.quantize.tag_int8_compute).

Beyond the reference's weight-only fp8 storage analogue, tagged block
matmuls run s8 x s8 -> s32 on the MXU with per-tensor activation scales.
Covers: dot numerics, site selection, scan compatibility (stacked leaves +
markers), static calibrated scales, geoada trees, and the full pipeline
single-device + mesh paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import versecrafter_tpu.utils.quantize as qz
from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward

CFG = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32, text_dim=24,
                   out_dim=4, num_heads=4, num_layers=2, text_len=8)


def _quantize_tagged(tree, act_scales=None, stacked=True):
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        return qz.tag_int8_compute(qz.quantize_tree(tree),
                                   act_scales=act_scales, stacked=stacked)
    finally:
        qz.MIN_SIZE = old


def _fwd_inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 24)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(12, max_pos=32))
    cos, sin = grid_cos_sin(ang, 2, 4, 4)
    t = jnp.asarray([500.0])
    return x, t, ctx, cos, sin


def test_int8_compute_dot_accuracy():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 32, 256)), jnp.float32)
    tree = _quantize_tagged({"self_attn": {"q": {"kernel": W}}},
                            stacked=False)
    leaf = tree["self_attn"]["q"]["kernel"]
    assert "a_dyn" in leaf and leaf["a_dyn"].shape == ()
    got = np.asarray(qz.int8_compute_dot(leaf, x))
    want = np.asarray(x @ W)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999
    # int8 result must also beat trivial alternatives: not all-zero/constant
    assert np.abs(got).max() > 0.1


def test_int8_compute_dot_static_scale_matches_dynamic():
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    absmax = float(jnp.abs(x).max())
    tree = _quantize_tagged(
        {"ffn_in": {"kernel": W}},
        act_scales={"ffn_in/kernel": absmax / 127.0}, stacked=False)
    leaf = tree["ffn_in"]["kernel"]
    assert "a_scale" in leaf and "a_dyn" not in leaf
    got_static = np.asarray(qz.int8_compute_dot(leaf, x))
    dyn = {k: v for k, v in leaf.items() if k != "a_scale"}
    dyn["a_dyn"] = jnp.zeros((), jnp.float32)
    old = qz.ROW_ACT_SCALES
    qz.ROW_ACT_SCALES = False  # compare against the PER-TENSOR dynamic mode
    try:
        got_dyn = np.asarray(qz.int8_compute_dot(dyn, x))
    finally:
        qz.ROW_ACT_SCALES = old
    # the calibrated scale here IS the dynamic absmax -> identical results
    np.testing.assert_array_equal(got_static, got_dyn)


def test_row_act_scales_beat_per_tensor_on_outlier_tokens():
    """Per-token dynamic scales (ROW_ACT_SCALES, the default) must cut the
    quant error vs one per-tensor scalar when some tokens carry outliers —
    the regime AdaLN-modulated DiT activations live in."""
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    xh = rng.standard_normal((4, 32, 256))
    xh[:, ::7, :] *= 8.0  # outlier tokens
    x = jnp.asarray(xh, jnp.float32)
    tree = _quantize_tagged({"self_attn": {"q": {"kernel": W}}},
                            stacked=False)
    leaf = tree["self_attn"]["q"]["kernel"]
    want = np.asarray(x @ W)
    old = qz.ROW_ACT_SCALES
    try:
        qz.ROW_ACT_SCALES = True
        rel_row = np.linalg.norm(np.asarray(
            qz.int8_compute_dot(leaf, x)) - want) / np.linalg.norm(want)
        qz.ROW_ACT_SCALES = False
        rel_tensor = np.linalg.norm(np.asarray(
            qz.int8_compute_dot(leaf, x)) - want) / np.linalg.norm(want)
    finally:
        qz.ROW_ACT_SCALES = old
    assert rel_row < rel_tensor * 0.6, (rel_row, rel_tensor)
    assert rel_row < 0.02


def test_tag_selects_compute_sites_only():
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    # make the text embedding big enough to quantize (storage-only site)
    params["text_embedding"]["fc1"]["kernel"] = jax.random.normal(
        jax.random.key(1), (512, 512), jnp.float32)
    q = _quantize_tagged(params)
    blocks = q["blocks"]
    for site in ("q", "k", "v", "o"):
        assert "a_dyn" in blocks["self_attn"][site]["kernel"]
        assert "a_dyn" in blocks["cross_attn"][site]["kernel"]
    assert "a_dyn" in blocks["ffn_in"]["kernel"]
    assert "a_dyn" in blocks["ffn_out"]["kernel"]
    # markers carry the stacked layer axis so lax.scan can slice them
    assert blocks["ffn_in"]["kernel"]["a_dyn"].shape == (CFG.num_layers,)
    # non-block sites stay storage-only (dequantized in-graph)
    te = q["text_embedding"]["fc1"]["kernel"]
    assert qz._is_quantized(te) and not qz.is_compute_tagged(te)
    # dequantize_tree leaves tagged leaves alone, force dequantizes all
    deq = qz.dequantize_tree(q, dtype=jnp.float32)
    assert qz.is_compute_tagged(deq["blocks"]["ffn_in"]["kernel"])
    assert not isinstance(deq["text_embedding"]["fc1"]["kernel"], dict)
    forced = qz.dequantize_tree(q, dtype=jnp.float32, force=True)
    assert not isinstance(forced["blocks"]["ffn_in"]["kernel"], dict)


def test_tag_sites_filter_ffn_only():
    """sites= restricts W8A8 to matching COMPUTE_SITES (the shape-aware
    policy: the chip microbench shows FFN dots win while qkv-shaped dots
    can lose under dynamic quant overhead)."""
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        q = qz.tag_int8_compute(qz.quantize_tree(params), sites=("ffn",))
    finally:
        qz.MIN_SIZE = old
    blocks = q["blocks"]
    assert qz.is_compute_tagged(blocks["ffn_in"]["kernel"])
    assert qz.is_compute_tagged(blocks["ffn_out"]["kernel"])
    for site in ("q", "k", "v", "o"):
        leaf = blocks["self_attn"][site]["kernel"]
        assert qz._is_quantized(leaf) and not qz.is_compute_tagged(leaf)
    # the filtered tree still runs (storage-only sites dequantize in-graph)
    x, t, ctx, cos, sin = _fwd_inputs()
    out = jax.jit(lambda p: wan_dit_forward(p, CFG, x, t, ctx, cos, sin))(q)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_compute_forward_close():
    params = init_wan_dit(jax.random.key(3), CFG, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(4),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    x, t, ctx, cos, sin = _fwd_inputs()
    q = _quantize_tagged(params)
    o1 = np.asarray(wan_dit_forward(params, CFG, x, t, ctx, cos, sin))
    o2 = np.asarray(wan_dit_forward(q, CFG, x, t, ctx, cos, sin))
    assert np.isfinite(o2).all()
    assert np.abs(o1 - o2).max() < 0.15
    assert np.corrcoef(o1.ravel(), o2.ravel())[0, 1] > 0.99
    # and the jitted/scanned path (stacked leaves + [L] markers through scan)
    o3 = np.asarray(jax.jit(
        lambda p, xx: wan_dit_forward(p, CFG, xx, t, ctx, cos, sin))(q, x))
    np.testing.assert_allclose(o3, o2, atol=1e-5)


def test_int8_compute_geoada_forward():
    cfg = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32,
                       text_dim=24, out_dim=4, num_heads=4, num_layers=2,
                       text_len=8, geoada_layers=(0,), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(5), cfg, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(6),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    x, t, ctx, cos, sin = _fwd_inputs()
    geo = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 8, 2, 8, 8)), jnp.float32)
    q = _quantize_tagged(params)
    # geoada block matmuls tagged; the zero-init projections stay untagged
    assert "a_dyn" in q["geoada_blocks"]["ffn_in"]["kernel"]
    assert not qz.is_compute_tagged(q["geoada_blocks"].get(
        "after_proj", {}).get("kernel", 0.0))
    o1 = np.asarray(wan_dit_forward(params, cfg, x, t, ctx, cos, sin,
                                    geoada_context=geo))
    o2 = np.asarray(wan_dit_forward(q, cfg, x, t, ctx, cos, sin,
                                    geoada_context=geo))
    assert np.isfinite(o2).all()
    assert np.corrcoef(o1.ravel(), o2.ravel())[0, 1] > 0.99


def test_calibrate_and_static_scales_forward():
    """wan_dit_forward(calibrate=True) -> fit_act_scales -> static W8A8:
    stats have per-layer shapes, static forward stays close to fp32, and
    with the scales calibrated on the SAME input the static path quantizes
    at least as tightly as dynamic (same absmax per site up to layer
    granularity)."""
    params = init_wan_dit(jax.random.key(3), CFG, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(4),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    x, t, ctx, cos, sin = _fwd_inputs()

    out, stats = wan_dit_forward(params, CFG, x, t, ctx, cos, sin,
                                 calibrate=True)
    assert set(stats) == {"blocks"}
    for site in ("self_attn/q/kernel", "self_attn/o/kernel",
                 "cross_attn/q/kernel", "cross_attn/k/kernel",
                 "cross_attn/o/kernel", "ffn_in/kernel", "ffn_out/kernel"):
        assert stats["blocks"][site].shape == (CFG.num_layers,), site
        assert (np.asarray(stats["blocks"][site]) > 0).all(), site
    # calibrate must not perturb the forward itself
    plain = wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), atol=1e-6)

    scales = qz.fit_act_scales([stats])
    assert "blocks/ffn_in/kernel" in scales
    q = _quantize_tagged(params, act_scales=scales)
    leaf = q["blocks"]["ffn_in"]["kernel"]
    assert "a_scale" in leaf and leaf["a_scale"].shape == (CFG.num_layers,)
    o_static = np.asarray(wan_dit_forward(q, CFG, x, t, ctx, cos, sin))
    o_fp32 = np.asarray(plain)
    assert np.isfinite(o_static).all()
    assert np.abs(o_fp32 - o_static).max() < 0.15
    assert np.corrcoef(o_fp32.ravel(), o_static.ravel())[0, 1] > 0.99


def test_calibrate_geoada_stats():
    cfg = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32,
                       text_dim=24, out_dim=4, num_heads=4, num_layers=2,
                       text_len=8, geoada_layers=(0,), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(5), cfg, jnp.float32)
    x, t, ctx, cos, sin = _fwd_inputs()
    geo = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 8, 2, 8, 8)), jnp.float32)
    _, stats = wan_dit_forward(params, cfg, x, t, ctx, cos, sin,
                               geoada_context=geo, calibrate=True)
    assert set(stats) == {"blocks", "geoada_blocks"}
    assert stats["blocks"]["ffn_in/kernel"].shape == (2,)
    assert stats["geoada_blocks"]["ffn_in/kernel"].shape == (1,)
    scales = qz.fit_act_scales([stats, stats])  # multi-step reduce
    q = _quantize_tagged(params, act_scales=scales)
    # geoada scales keyed by the geoada_blocks prefix, not the base ones
    assert "a_scale" in q["geoada_blocks"]["ffn_in"]["kernel"]
    assert q["geoada_blocks"]["ffn_in"]["kernel"]["a_scale"].shape == (1,)
    assert "a_scale" in q["blocks"]["ffn_in"]["kernel"]
    o = wan_dit_forward(q, cfg, x, t, ctx, cos, sin, geoada_context=geo)
    assert np.isfinite(np.asarray(o)).all()


def test_pipeline_int8_compute_end_to_end():
    from tests.test_sharded_pipeline import (VerseCrafterPipeline,
                                             _components, _run)
    ref = _run(VerseCrafterPipeline(**_components()))
    pipe = VerseCrafterPipeline(**_components())
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        pipe.quantize_weights(int8_compute=True)
    finally:
        qz.MIN_SIZE = old
    assert qz.is_compute_tagged(
        pipe.dit_params["blocks"]["ffn_in"]["kernel"])
    video = _run(pipe)
    assert np.isfinite(video).all()
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref), atol=0.1)


def test_pipeline_int8_compute_with_teacache_and_cfg_skip():
    """W8A8 combined with the acceleration paths (serving requests can
    toggle both): the TeaCache lax.cond and the cfg-skip shape switch must
    carry compute-tagged leaves."""
    from tests.test_sharded_pipeline import (VerseCrafterPipeline,
                                             _components, _run)
    pipe = VerseCrafterPipeline(**_components())
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        pipe.quantize_weights(int8_compute=True)
    finally:
        qz.MIN_SIZE = old
    pipe.enable_teacache(threshold=1e30, skip_start=1, coefficients=(0.0,))
    pipe.enable_cfg_skip(0.5)
    video = _run(pipe)
    assert np.isfinite(video).all()


def test_pipeline_int8_compute_under_mesh():
    """quantize_weights(int8_compute=True) AFTER set_mesh: markers
    replicated, qvalues keep their shardings, sharded W8A8 forward matches
    the single-device unquantized output within int8 tolerance."""
    from jax.sharding import NamedSharding
    from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
    from tests.test_sharded_pipeline import (VerseCrafterPipeline,
                                             _components, _run)
    ref = _run(VerseCrafterPipeline(**_components()))
    mesh = make_mesh(MeshSpec(sp=2, tp=2), devices=jax.devices()[:4])
    pipe = VerseCrafterPipeline(**_components())
    pipe.set_mesh(mesh)
    orig_spec = pipe.dit_params["blocks"]["ffn_in"]["kernel"].sharding.spec
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        pipe.quantize_weights(int8_compute=True)
    finally:
        qz.MIN_SIZE = old
    leaf = pipe.dit_params["blocks"]["ffn_in"]["kernel"]
    assert "a_dyn" in leaf
    assert isinstance(leaf["qvalues"].sharding, NamedSharding)
    assert leaf["qvalues"].sharding.spec == orig_spec
    assert isinstance(leaf["a_dyn"].sharding, NamedSharding)
    video = _run(pipe)
    assert np.isfinite(video).all()
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref), atol=0.12)


def test_w4a8_dot_and_tagging():
    """W4A8: per-channel int4 leaves tag for int8 compute (the packed
    nibbles unpack to s8 in [-7, 7]); grouped int4 stays storage-only."""
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.1, jnp.float32)
    tree = {"blocks": {"ffn_in": {"kernel": w}}}

    q4c = qz.tag_int8_compute(
        qz.quantize_tree(tree, bits=4, group_size=0), stacked=False)
    leaf = q4c["blocks"]["ffn_in"]["kernel"]
    assert qz.is_compute_tagged(leaf) and "q4values" in leaf

    q4g = qz.tag_int8_compute(qz.quantize_tree(tree, bits=4), stacked=False)
    assert not qz.is_compute_tagged(q4g["blocks"]["ffn_in"]["kernel"])

    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    got = np.asarray(qz.int8_compute_dot(leaf, x))
    want = np.asarray(x @ qz.dequantize_tree(
        {"k": dict(leaf)}, force=True)["k"])
    # activation quantization adds ~1/127 on top of the int4 weight error
    denom = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / denom < 0.05
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_w4a8_forward_close():
    """Full scanned forward with W4A8-tagged blocks stays close to fp32
    (pipeline.quantize_weights(bits=4, int8_compute=True) path)."""
    params = init_wan_dit(jax.random.key(3), CFG, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(4),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    x, t, ctx, cos, sin = _fwd_inputs()

    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        q = qz.tag_int8_compute(
            qz.quantize_tree(params, bits=4, group_size=0))
    finally:
        qz.MIN_SIZE = old
    o1 = np.asarray(wan_dit_forward(params, CFG, x, t, ctx, cos, sin))
    o2 = np.asarray(jax.jit(
        lambda p, xx: wan_dit_forward(p, CFG, xx, t, ctx, cos, sin))(q, x))
    assert np.isfinite(o2).all()
    assert np.corrcoef(o1.ravel(), o2.ravel())[0, 1] > 0.95


def test_w4a8_mesh_sharding_preserved():
    """W4A8 under a mesh: nibble-packed q4values keep the leaf's sharding
    (the packed contracting dim halves but stays divisible), scales are
    not replicated-gathered, and the sharded forward matches the
    single-device unquantized output within int4+int8 tolerance."""
    from jax.sharding import NamedSharding
    from tests.test_sharded_pipeline import (VerseCrafterPipeline,
                                             _components, _run)
    from versecrafter_tpu.core.mesh import MeshSpec, make_mesh

    ref = _run(VerseCrafterPipeline(**_components()))
    mesh = make_mesh(MeshSpec(sp=2, tp=2), devices=jax.devices()[:4])
    pipe = VerseCrafterPipeline(**_components())
    pipe.set_mesh(mesh)
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        pipe.quantize_weights(bits=4, int8_compute=True)
    finally:
        qz.MIN_SIZE = old
    leaf = pipe.dit_params["blocks"]["ffn_in"]["kernel"]
    assert "q4values" in leaf and qz.is_compute_tagged(leaf)
    assert isinstance(leaf["q4values"].sharding, NamedSharding)
    video = _run(pipe)
    assert np.isfinite(video).all()
    # int4 weights + int8 activations: coarser than the W8A8 test's 0.12
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref), atol=0.25)


@pytest.mark.parametrize("mode", ["row", "static", "tensor"])
def test_int8_dot_chunked_bit_identical(mode, monkeypatch):
    """Above INT8_DOT_CHUNK_ROWS the dot runs chunked via lax.map (the
    720p-on-one-chip memory fix) — per-row and static scales are row-local
    and the per-tensor dynamic absmax is hoisted, so chunking must be
    BIT-identical, including a non-divisible row count (zero-padded rows
    sliced off)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 103, 64)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    tree = _quantize_tagged({"p": {"kernel": W}}, stacked=False)
    leaf = tree["p"]["kernel"]
    if mode == "static":
        leaf = dict(leaf, a_scale=jnp.asarray(0.02, jnp.float32))
    if mode == "tensor":
        monkeypatch.setattr(qz, "ROW_ACT_SCALES", False)
    ref = qz.int8_compute_dot(leaf, x)
    monkeypatch.setattr(qz, "INT8_DOT_CHUNK_ROWS", 16)
    out = qz.int8_compute_dot(leaf, x)
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
