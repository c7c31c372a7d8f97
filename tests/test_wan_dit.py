"""Wan DiT + GeoAdapter model tests (tiny configs on the CPU mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
from versecrafter_tpu.models.wan_dit import (
    init_wan_dit,
    patchify,
    sinusoidal_embedding_1d,
    unpatchify,
    wan_dit_forward,
)

TINY = WanDiTConfig(
    in_dim=4, dim=96, ffn_dim=192, freq_dim=32, text_dim=48, out_dim=4,
    num_heads=4, num_layers=4, text_len=16,
)
TINY_GEO = dataclasses.replace(TINY, geoada_layers=(), geoada_in_dim=8)


def _rope(cfg, f, h, w):
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim, max_pos=64))
    return grid_cos_sin(ang, f, h, w)


def _inputs(cfg, b=1, f=3, h=4, w=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, cfg.in_dim, f, h * 2, w * 2)), jnp.float32)
    t = jnp.asarray([500.0] * b)
    ctx = jnp.asarray(rng.standard_normal((b, cfg.text_len, cfg.text_dim)), jnp.float32)
    cos, sin = _rope(cfg, f, h, w)
    return x, t, ctx, cos, sin


def test_patchify_unpatchify_roundtrip():
    """patchify is (c, pt, ph, pw)-ordered (conv3d inner product); unpatchify
    consumes the head's (pt, ph, pw, c) order (reference einsum
    'fhwpqrc->cfphqwr'). Reordering between them must give the identity."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 6, 8)), jnp.float32)
    p = patchify(x, (1, 2, 2))
    assert p.shape == (2, 4 * 3 * 4, 3 * 4)
    b, s, _ = p.shape
    p_headorder = p.reshape(b, s, 3, 1, 2, 2).transpose(0, 1, 3, 4, 5, 2).reshape(b, s, -1)
    y = unpatchify(p_headorder, (4, 3, 4), (1, 2, 2), 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_patchify_matches_conv3d_ordering():
    """patchify channel order must equal conv3d(kernel=stride=patch) flatten."""
    rng = np.random.default_rng(1)
    c, pt, ph, pw = 3, 1, 2, 2
    x = rng.standard_normal((1, c, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((5, c, pt, ph, pw)).astype(np.float32)  # torch layout
    # naive strided conv
    want = np.zeros((1, 5, 2, 2, 2), np.float32)
    for f in range(2):
        for i in range(2):
            for j in range(2):
                patch = x[0, :, f * pt:(f + 1) * pt, i * ph:(i + 1) * ph, j * pw:(j + 1) * pw]
                want[0, :, f, i, j] = (w * patch[None]).sum(axis=(1, 2, 3, 4))
    kernel = jnp.asarray(w.reshape(5, -1).T)  # [c*pt*ph*pw, out]
    tokens = patchify(jnp.asarray(x), (pt, ph, pw)) @ kernel
    got = np.asarray(tokens).reshape(1, 2, 2, 2, 5).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sinusoidal_embedding_matches_reference_math():
    dim, pos = 16, np.array([0.0, 1.0, 999.0])
    half = dim // 2
    sinusoid = np.outer(pos, np.power(10000.0, -np.arange(half) / half))
    want = np.concatenate([np.cos(sinusoid), np.sin(sinusoid)], axis=1)
    got = np.asarray(sinusoidal_embedding_1d(dim, jnp.asarray(pos)))
    # fp32 jax vs fp64 numpy: large angles at pos=999 differ at ~1e-5
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_forward_shapes_and_determinism():
    params = init_wan_dit(jax.random.key(0), TINY, dtype=jnp.float32)
    x, t, ctx, cos, sin = _inputs(TINY)
    out1 = wan_dit_forward(params, TINY, x, t, ctx, cos, sin)
    out2 = wan_dit_forward(params, TINY, x, t, ctx, cos, sin)
    assert out1.shape == (1, TINY.out_dim, 3, 8, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def _unzero_head(params, key):
    """The reference zero-inits the output head (wan_transformer3d.py:1174),
    which makes forward outputs constant; give it weights so block-level
    differences reach the output."""
    params["head"]["head"]["kernel"] = (
        jax.random.normal(key, params["head"]["head"]["kernel"].shape) * 0.05)
    return params


def test_zero_init_geoadapter_matches_backbone():
    """With zero-init before/after projections the GeoAdapter must be a
    numerical no-op relative to the plain backbone (the reference's frozen
    base + zero-init adapter startup condition)."""
    geo_params = _unzero_head(
        init_wan_dit(jax.random.key(0), TINY_GEO, dtype=jnp.float32),
        jax.random.key(10))
    x, t, ctx, cos, sin = _inputs(TINY_GEO)
    gctx = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 8, 3, 8, 8)), jnp.float32)

    out_geo = wan_dit_forward(
        geo_params, TINY_GEO, x, t, ctx, cos, sin,
        geoada_context=gctx, geoada_scale=1.0)

    base_params = {k: v for k, v in geo_params.items()
                   if not k.startswith("geoada")}
    out_base = wan_dit_forward(base_params, TINY, x, t, ctx, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out_geo), np.asarray(out_base), rtol=1e-5, atol=1e-6)


def test_geoadapter_nonzero_proj_changes_output_scaled():
    """Non-zero after_proj: output differs, and geoada_scale=0 restores the
    backbone result (context_scale semantics,
    wan_transformer3d_versecrafter.py:144-148)."""
    params = _unzero_head(
        init_wan_dit(jax.random.key(1), TINY_GEO, dtype=jnp.float32),
        jax.random.key(11))
    # un-zero the skip projections
    params["geoada_blocks"]["after_proj"]["kernel"] = (
        jax.random.normal(jax.random.key(2),
                          params["geoada_blocks"]["after_proj"]["kernel"].shape) * 0.1)
    x, t, ctx, cos, sin = _inputs(TINY_GEO, seed=4)
    gctx = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 8, 3, 8, 8)), jnp.float32)

    out1 = wan_dit_forward(params, TINY_GEO, x, t, ctx, cos, sin,
                           geoada_context=gctx, geoada_scale=1.0)
    out0 = wan_dit_forward(params, TINY_GEO, x, t, ctx, cos, sin,
                           geoada_context=gctx, geoada_scale=0.0)
    base_params = {k: v for k, v in params.items() if not k.startswith("geoada")}
    out_base = wan_dit_forward(base_params, TINY, x, t, ctx, cos, sin)

    assert np.abs(np.asarray(out1) - np.asarray(out_base)).max() > 1e-4
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_base),
                               rtol=1e-5, atol=1e-6)


def test_i2v_forward():
    cfg = dataclasses.replace(TINY, model_type="i2v", add_img_emb=True,
                              in_dim=8)  # 4 latent + 4 conditioning channels
    params = init_wan_dit(jax.random.key(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((1, 7, cfg.img_emb_dim)), jnp.float32)
    t = jnp.asarray([250.0])
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.float32)
    cos, sin = _rope(cfg, 3, 4, 4)
    out = wan_dit_forward(params, cfg, x, t, ctx, cos, sin, y=y, clip_fea=clip)
    assert out.shape == (1, cfg.out_dim, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_modulates_output():
    params = _unzero_head(init_wan_dit(jax.random.key(4), TINY, dtype=jnp.float32),
                          jax.random.key(12))
    x, _, ctx, cos, sin = _inputs(TINY, seed=7)
    o1 = wan_dit_forward(params, TINY, x, jnp.asarray([100.0]), ctx, cos, sin)
    o2 = wan_dit_forward(params, TINY, x, jnp.asarray([900.0]), ctx, cos, sin)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_window_size_config_threads_to_attention():
    """cfg.window_size reaches self-attention: a windowed config changes the
    output, and the pallas and xla paths agree under the same window."""
    params = _unzero_head(
        init_wan_dit(jax.random.key(0), TINY, dtype=jnp.float32),
        jax.random.key(5))
    cfg_win = dataclasses.replace(TINY, window_size=(8, 8))
    x, t, ctx, cos, sin = _inputs(TINY, f=3, h=4, w=4)  # 48 tokens

    full = wan_dit_forward(params, TINY, x, t, ctx, cos, sin)
    win_xla = wan_dit_forward(params, cfg_win, x, t, ctx, cos, sin,
                              attn_impl="xla")
    win_pl = wan_dit_forward(params, cfg_win, x, t, ctx, cos, sin,
                             attn_impl="pallas")
    assert float(jnp.abs(win_xla - full).max()) > 1e-5  # window changes output
    # pallas now routes through the FUSED norm+rope kernel (bf16 rope
    # tables, one fewer rounding) — tolerance matches its documented 2e-3
    # fused-vs-unfused contract instead of the old bit-level agreement
    np.testing.assert_allclose(np.asarray(win_pl), np.asarray(win_xla),
                               rtol=2e-3, atol=5e-4)


def test_window_size_under_sequence_parallelism():
    """window_size composes with SP (reference composes it with USP,
    wan_transformer3d.py:399): after Ulysses' all_to_all the full sequence is
    local, so the windowed kernel applies unchanged."""
    from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
    from versecrafter_tpu.parallel.sharding import (
        mesh_context, shard_dit_params)

    params = _unzero_head(
        init_wan_dit(jax.random.key(0), TINY, dtype=jnp.float32),
        jax.random.key(5))
    cfg_win = dataclasses.replace(TINY, window_size=(8, 8))
    x, t, ctx, cos, sin = _inputs(TINY, f=3, h=4, w=4)  # 48 tokens

    want = wan_dit_forward(params, cfg_win, x, t, ctx, cos, sin)
    mesh = make_mesh(MeshSpec(sp=2), devices=jax.devices()[:2])
    with mesh_context(mesh):
        got = jax.jit(lambda p, *a: wan_dit_forward(
            p, cfg_win, *a, attn_impl="sp"))(
            shard_dit_params(params, mesh), x, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_geoada_stacked_matches_interleaved():
    """The inference geoada schedule (all hints first, then the base stack —
    two plain scans) must match the training interleaved superstep exactly:
    the hint chain depends only on the initial tokens, so the order is a
    pure schedule choice (round-3 restructure for the fused kernel)."""
    import dataclasses
    from versecrafter_tpu.models.wan_dit import wan_dit_blocks

    cfg = dataclasses.replace(TINY, geoada_layers=(), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(3), cfg, dtype=jnp.float32)
    # geoada after_proj is zero-init (hints are zero) — randomize so the
    # hint path actually contributes
    params["geoada_blocks"]["after_proj"]["kernel"] = jax.random.normal(
        jax.random.key(4),
        params["geoada_blocks"]["after_proj"]["kernel"].shape) * 0.1

    rng = np.random.default_rng(0)
    b, s, d = 2, 3 * 4 * 4, cfg.dim
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    gtok = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((b, 6, d)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, cfg.text_len, d)), jnp.float32)
    cos, sin = _rope(cfg, 3, 4, 4)

    import versecrafter_tpu.models.wan_dit as wd
    old = wd.GEOADA_STACKED_HINTS
    wd.GEOADA_STACKED_HINTS = True
    try:
        out_inf = wan_dit_blocks(params, cfg, x, e0, cos, sin, ctx,
                                 geoada_tokens=gtok, geoada_scale=0.7,
                                 attn_impl="xla", remat=False)
    finally:
        wd.GEOADA_STACKED_HINTS = old
    out_train = wan_dit_blocks(params, cfg, x, e0, cos, sin, ctx,
                               geoada_tokens=gtok, geoada_scale=0.7,
                               attn_impl="xla", remat=True)
    np.testing.assert_allclose(np.asarray(out_inf), np.asarray(out_train),
                               atol=1e-5, rtol=1e-5)


def test_geoada_only_quantized_forward():
    """A quantized geoada subtree next to UNQUANTIZED base blocks (adapter-
    only int8) must still dequantize — deq is chosen per leaf, not from the
    base blocks' quantization state."""
    import versecrafter_tpu.utils.quantize as qz
    from versecrafter_tpu.models.wan_dit import wan_dit_blocks

    cfg = dataclasses.replace(TINY, geoada_layers=(), geoada_in_dim=8)
    params = init_wan_dit(jax.random.key(5), cfg, dtype=jnp.float32)
    params["geoada_blocks"]["after_proj"]["kernel"] = jax.random.normal(
        jax.random.key(6),
        params["geoada_blocks"]["after_proj"]["kernel"].shape) * 0.1

    b, s, d = 1, 3 * 4 * 4, cfg.dim
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    gtok = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((b, 6, d)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, cfg.text_len, d)), jnp.float32)
    cos, sin = _rope(cfg, 3, 4, 4)

    ref = wan_dit_blocks(params, cfg, x, e0, cos, sin, ctx,
                         geoada_tokens=gtok, geoada_scale=0.7,
                         attn_impl="xla", remat=False)

    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 6  # tiny model: let its small leaves quantize
    try:
        qparams = dict(params)
        qparams["geoada_blocks"] = qz.quantize_tree(params["geoada_blocks"])
    finally:
        qz.MIN_SIZE = old
    got = wan_dit_blocks(qparams, cfg, x, e0, cos, sin, ctx,
                         geoada_tokens=gtok, geoada_scale=0.7,
                         attn_impl="xla", remat=False)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert np.isfinite(np.asarray(got)).all()
    assert 0 < err < 0.5, err  # int8-close, and actually quantized


def test_ffn_chunked_matches_unchunked(monkeypatch):
    """The >70k-row chunked FFN (the 720p single-chip memory path) must
    match the plain forward exactly — rows are independent through
    linear->gelu->linear, including with a non-divisible row count."""
    import versecrafter_tpu.models.wan_dit as wd

    params = init_wan_dit(jax.random.key(0), TINY, jnp.float32)
    x, t, ctx, cos, sin = _inputs(TINY, f=3, h=4, w=4)
    ref = wan_dit_forward(params, TINY, x, t, ctx, cos, sin)
    monkeypatch.setattr(wd, "FFN_CHUNK_ROWS", 7)  # 48 rows -> 7-row chunks
    out = wan_dit_forward(params, TINY, x, t, ctx, cos, sin)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wan_dit_e0_matches_embed_e0():
    """wan_dit_e0 (the host-gated TeaCache metric program,
    sampling/teacache.host_gate) must reproduce wan_dit_embed's e0 exactly
    — on a bf16 tree AND on a quantized tree (the 14B staged path hands it
    int8/int4 leaves, which it dequantizes itself)."""
    from versecrafter_tpu.models.wan_dit import wan_dit_e0, wan_dit_embed
    from versecrafter_tpu.utils import quantize as qz

    params = init_wan_dit(jax.random.key(3), TINY, dtype=jnp.float32)
    x, t, ctx, cos, sin = _inputs(TINY)
    _, _, e0_ref, _, _, _ = wan_dit_embed(params, TINY, x, t, ctx)
    e0 = wan_dit_e0(params, TINY, t)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e0_ref),
                               rtol=1e-6, atol=1e-6)

    old_min = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        qparams = qz.quantize_tree(params, bits=8)
    finally:
        qz.MIN_SIZE = old_min
    e0_q = wan_dit_e0(qparams, TINY, t)
    assert e0_q.shape == e0_ref.shape and e0_q.dtype == jnp.float32
    # int8 weight rounding envelope, not exactness
    scale = np.abs(np.asarray(e0_ref)).max()
    assert np.abs(np.asarray(e0_q) - np.asarray(e0_ref)).max() <= 0.06 * max(scale, 1.0)
