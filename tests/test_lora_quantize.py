"""LoRA merge/unmerge and int8 weight quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.core.config import WanDiTConfig
from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward
from versecrafter_tpu.utils.lora import merge_lora, unmerge_lora
from versecrafter_tpu.utils.quantize import (
    dequantize_tree, quantize_tree, tree_bytes)

CFG = WanDiTConfig(in_dim=4, dim=48, ffn_dim=96, freq_dim=32, text_dim=24,
                   out_dim=4, num_heads=4, num_layers=2, text_len=8)


def test_lora_merge_unmerge_roundtrip():
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    rng = np.random.default_rng(0)
    r = 4
    lora = {
        "blocks.1.self_attn.q.lora_down.weight": rng.standard_normal((r, 48)).astype(np.float32),
        "blocks.1.self_attn.q.lora_up.weight": rng.standard_normal((48, r)).astype(np.float32),
        "blocks.0.ffn.0.lora_A.weight": rng.standard_normal((r, 48)).astype(np.float32),
        "blocks.0.ffn.0.lora_B.weight": rng.standard_normal((96, r)).astype(np.float32),
    }
    orig_q = np.asarray(params["blocks"]["self_attn"]["q"]["kernel"])
    merged = merge_lora(params, lora, weight=0.55)

    # layer 1 q changed by 0.55 * (up@down)^T; layer 0 q unchanged
    delta = 0.55 * (lora["blocks.1.self_attn.q.lora_up.weight"]
                    @ lora["blocks.1.self_attn.q.lora_down.weight"]).T
    got = np.asarray(merged["blocks"]["self_attn"]["q"]["kernel"])
    np.testing.assert_allclose(got[1], orig_q[1] + delta, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got[0], orig_q[0])
    # ffn_in layer 0 changed
    assert np.abs(np.asarray(merged["blocks"]["ffn_in"]["kernel"][0])
                  - np.asarray(params["blocks"]["ffn_in"]["kernel"][0])).max() > 1e-4

    restored = unmerge_lora(merged, lora, weight=0.55)
    np.testing.assert_allclose(
        np.asarray(restored["blocks"]["self_attn"]["q"]["kernel"]),
        orig_q, rtol=1e-4, atol=1e-5)


def test_quantize_roundtrip_and_size():
    params = init_wan_dit(jax.random.key(1), CFG, jnp.float32)
    # enlarge one weight so it crosses the quantization size threshold
    big = jax.random.normal(jax.random.key(2), (512, 512), jnp.float32)
    params["text_embedding"]["fc1"]["kernel"] = big

    q = quantize_tree(params)
    assert tree_bytes(jax.tree.leaves(q)) < tree_bytes(jax.tree.leaves(params))
    dq = dequantize_tree(q)
    got = np.asarray(dq["text_embedding"]["fc1"]["kernel"])
    want = np.asarray(big)
    # int8 per-channel: relative error bounded by ~1/127 of channel absmax
    err = np.abs(got - want).max(0)
    bound = np.abs(want).max(0) / 127.0 + 1e-6
    assert (err <= bound * 0.51).all()
    # modulation excluded
    assert not isinstance(q["blocks"]["modulation"], dict)


def test_quantized_forward_close():
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles

    params = init_wan_dit(jax.random.key(3), CFG, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(4), params["head"]["head"]["kernel"].shape) * 0.05)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 24)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(12, max_pos=32))
    cos, sin = grid_cos_sin(ang, 2, 4, 4)
    t = jnp.asarray([500.0])

    # lower the size threshold so the tiny model actually quantizes
    import versecrafter_tpu.utils.quantize as qz
    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1024
    try:
        q = quantize_tree(params)
        dq = dequantize_tree(q)
    finally:
        qz.MIN_SIZE = old
    o1 = wan_dit_forward(params, CFG, x, t, ctx, cos, sin)
    o2 = wan_dit_forward(dq, CFG, x, t, ctx, cos, sin)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() < 0.1
    assert np.corrcoef(np.asarray(o1).ravel(), np.asarray(o2).ravel())[0, 1] > 0.99


def test_int4_packed_roundtrip_and_size():
    """bits=4: nibble-packed storage is HALF the int8 bytes and dequantizes
    within the coarser per-channel bound (absmax/7); odd contracting dims
    are left unquantized rather than mis-packed."""
    import versecrafter_tpu.utils.quantize as qz

    big = jax.random.normal(jax.random.key(5), (512, 256), jnp.float32)
    tree = {"a": {"kernel": big},
            "odd": {"kernel": jax.random.normal(jax.random.key(6),
                                                (511, 256), jnp.float32)}}
    q8 = qz.quantize_tree(tree)
    q4 = qz.quantize_tree(tree, bits=4)
    leaf = q4["a"]["kernel"]
    assert "q4values" in leaf and leaf["q4values"].dtype == jnp.uint8
    assert leaf["q4values"].shape == (256, 256)
    assert leaf["q4values"].nbytes * 2 == q8["a"]["kernel"]["qvalues"].nbytes
    assert not isinstance(q4["odd"]["kernel"], dict)  # odd dim: untouched

    got = np.asarray(qz.dequantize_tree(q4)["a"]["kernel"])
    want = np.asarray(big)
    err = np.abs(got - want).max(0)
    bound = np.abs(want).max(0) / 7.0 + 1e-6
    assert (err <= bound * 0.51).all()


def test_int4_forward_close():
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    import versecrafter_tpu.utils.quantize as qz

    params = init_wan_dit(jax.random.key(3), CFG, jnp.float32)
    params["head"]["head"]["kernel"] = (
        jax.random.normal(jax.random.key(4),
                          params["head"]["head"]["kernel"].shape) * 0.05)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 24)), jnp.float32)
    ang = tuple(jnp.asarray(a) for a in rope_3d_angles(12, max_pos=32))
    cos, sin = grid_cos_sin(ang, 2, 4, 4)
    t = jnp.asarray([500.0])

    old = qz.MIN_SIZE
    qz.MIN_SIZE = 1024
    try:
        q4 = qz.quantize_tree(params, bits=4)
    finally:
        qz.MIN_SIZE = old
    o1 = np.asarray(wan_dit_forward(params, CFG, x, t, ctx, cos, sin))
    # jitted + scanned path: packed [L, K/2, N] leaves slice per layer
    o2 = np.asarray(jax.jit(
        lambda p, xx: wan_dit_forward(p, CFG, xx, t, ctx, cos, sin))(q4, x))
    assert np.isfinite(o2).all()
    assert np.corrcoef(o1.ravel(), o2.ravel())[0, 1] > 0.95


def test_stacked_bias_and_norm_leaves_never_quantize():
    """Stacked per-layer [L, d] biases/norm scales must NOT quantize even
    above MIN_SIZE: axis -2 there is the LAYER axis (wrong scales, and the
    [1, d] qscales would break the per-layer scan). Only matmul kernels
    quantize. This is the production pipeline.quantize_weights case — a
    stacked 14B tree has [40, 5120] biases above the size threshold."""
    import versecrafter_tpu.utils.quantize as qz

    tree = {
        "blocks": {
            "ffn_in": {"kernel": jnp.ones((4, 512, 256), jnp.float32),
                       "bias": jnp.ones((4, 70000), jnp.float32)},
            "norm3": {"scale": jnp.ones((4, 70000), jnp.float32)},
        }
    }
    q = qz.quantize_tree(tree)
    assert isinstance(q["blocks"]["ffn_in"]["kernel"], dict)      # quantized
    assert not isinstance(q["blocks"]["ffn_in"]["bias"], dict)    # untouched
    assert not isinstance(q["blocks"]["norm3"]["scale"], dict)    # untouched
    # scales reduce the true input axis, giving per-output-channel columns
    assert q["blocks"]["ffn_in"]["kernel"]["qscales"].shape == (4, 1, 256)


def test_int4_groupwise_scales():
    """bits=4 defaults to 128-row group scales when the contracting dim
    allows: per-group error bound holds, and a leaf with an outlier row
    quantizes strictly better than forced per-channel scales."""
    import versecrafter_tpu.utils.quantize as qz

    rng = np.random.default_rng(7)
    w = rng.standard_normal((512, 256)).astype(np.float32)
    w[3, :] *= 50.0  # outlier row poisons a per-channel scale
    tree = {"a": {"kernel": jnp.asarray(w)}}

    q4g = qz.quantize_tree(tree, bits=4)  # auto: grouped (512 % 128 == 0)
    leaf = q4g["a"]["kernel"]
    assert leaf["qscales"].shape == (4, 1, 256)
    got = np.asarray(qz.dequantize_tree(q4g)["a"]["kernel"])
    bound = np.abs(w.reshape(4, 128, 256)).max(1, keepdims=True) / 7.0 + 1e-6
    assert (np.abs((got - w).reshape(4, 128, 256)) <= bound * 0.51).all()

    q4c = qz.quantize_tree(tree, bits=4, group_size=0)  # force per-channel
    assert q4c["a"]["kernel"]["qscales"].shape == (1, 256)
    got_c = np.asarray(qz.dequantize_tree(q4c)["a"]["kernel"])
    # error away from the outlier row: grouped must be much tighter
    err_g = np.abs(got - w)[128:].max()
    err_c = np.abs(got_c - w)[128:].max()
    assert err_g < err_c / 4, (err_g, err_c)


def test_int4_groupwise_stacked_scan_slicing():
    """Stacked [L, K, N] leaves: grouped scales are [L, K/g, 1, N] and the
    jitted per-layer path still dequantizes correctly."""
    import versecrafter_tpu.utils.quantize as qz

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((3, 256, 128)), jnp.float32)
    q = qz.quantize_tree({"k": {"kernel": w}}, bits=4)["k"]["kernel"]
    assert q["qscales"].shape == (3, 2, 1, 128)
    deq = jax.jit(qz.dequantize_leaf)(q)
    assert deq.shape == w.shape
    assert float(jnp.abs(deq - w).max()) < float(jnp.abs(w).max()) / 7.0 + 1e-5


def test_int8_compute_tag_skips_groupwise():
    """tag_int8_compute must not tag group-scaled int8 leaves (the MXU dot
    epilogue folds one per-channel scale)."""
    import versecrafter_tpu.utils.quantize as qz

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    tree = {"blocks": {"ffn_in": {"kernel": w}}}
    qg = qz.quantize_tree(tree, bits=8, group_size=64)
    tagged = qz.tag_int8_compute(qg)
    assert not qz.is_compute_tagged(tagged["blocks"]["ffn_in"]["kernel"])
    qc = qz.quantize_tree(tree, bits=8)
    tagged_c = qz.tag_int8_compute(qc)
    assert qz.is_compute_tagged(tagged_c["blocks"]["ffn_in"]["kernel"])


def test_lora_training_export_roundtrip():
    """Factors trained jax-side export in torch naming and fold back via
    merge_lora to EXACTLY the effective params apply_lora_tree built —
    adapters trained here load anywhere the reference's format does."""
    from versecrafter_tpu.utils.lora import (apply_lora_tree, init_lora,
                                             lora_to_torch_sd, merge_lora)

    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    lora = init_lora(params, rank=4, key=jax.random.key(1))
    # zero-init up => exact no-op before training
    eff0 = apply_lora_tree(params, lora, scale=0.7)
    np.testing.assert_array_equal(
        np.asarray(eff0["blocks"]["ffn_in"]["kernel"]),
        np.asarray(params["blocks"]["ffn_in"]["kernel"]))

    # fake a training update so deltas are non-trivial
    lora = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.key(2), a.shape),
        lora)
    eff = apply_lora_tree(params, lora, scale=0.7)
    merged = merge_lora(params, {k: np.asarray(v) for k, v in
                                 lora_to_torch_sd(lora).items()}, weight=0.7)
    for g, t in (("blocks", "ffn_in"), ("blocks", "self_attn")):
        a = eff[g][t]["kernel"] if t == "ffn_in" else \
            eff[g][t]["q"]["kernel"]
        b = merged[g][t]["kernel"] if t == "ffn_in" else \
            merged[g][t]["q"]["kernel"]
        assert float(jnp.abs(a - b).max()) < 1e-5, (g, t)
    # and it changed something
    assert float(jnp.abs(eff["blocks"]["ffn_in"]["kernel"]
                         - params["blocks"]["ffn_in"]["kernel"]).max()) > 0


def test_lora_training_cli_smoke(tmp_path):
    """Tiny LoRA finetune: finite decreasing-ish loss, torch-naming npz
    exported, and the exported adapter merges into a fresh base tree."""
    from versecrafter_tpu.cli import train
    from versecrafter_tpu.utils.lora import merge_lora

    losses = train.main([
        "--tiny", "--synthetic", "4", "--steps", "6", "--batch_size", "2",
        "--sample_size", "64,64", "--video_length", "9",
        "--lora_rank", "4", "--lr", "1e-2",
        "--output_dir", str(tmp_path)])
    assert np.isfinite(losses).all()
    assert min(losses[3:]) < losses[0]
    st = tmp_path / "step_000006_lora.safetensors"
    assert st.exists()
    from versecrafter_tpu.core.convert import load_torch_state_dict
    sd = load_torch_state_dict(str(st))
    assert any(k.endswith("lora_down.weight") for k in sd)
    params = init_wan_dit(jax.random.key(0), CFG, jnp.float32)
    # tiny train cfg differs from CFG; merge only checks the mapping on
    # matching shapes — build the same tiny cfg the CLI used
    from versecrafter_tpu.core.config import WanDiTConfig
    tiny = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                        text_dim=48, out_dim=4, num_heads=4, num_layers=4,
                        text_len=16, geoada_layers=(), geoada_in_dim=8)
    base = init_wan_dit(jax.random.key(1), tiny, jnp.float32)
    before = np.asarray(base["blocks"]["ffn_in"]["kernel"]).copy()
    merged = merge_lora(base, sd, weight=1.0)
    after = np.asarray(merged["blocks"]["ffn_in"]["kernel"])
    assert np.abs(after - before).max() > 0  # trained deltas landed
