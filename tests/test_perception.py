"""Perception layer tests: ViT, MoGe head + intrinsics recovery, segmenter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.perception import moge
from versecrafter_tpu.perception.segmenter import ImageSegmenter
from versecrafter_tpu.perception.vit import init_vit, vit_forward

TINY_VIT = dict(patch=14, dim=64, depth=2, heads=4)


def test_vit_shapes():
    params = init_vit(jax.random.key(0), **TINY_VIT)
    x = jnp.asarray(np.random.default_rng(0).random((1, 42, 56, 3)), jnp.float32)
    tok, outs = vit_forward(params, x, patch=14, heads=4, out_layers=(0, 1))
    assert tok.shape == (1, 1 + 3 * 4, 64)
    assert len(outs) == 2
    assert np.isfinite(np.asarray(tok)).all()


def test_moge_forward_shapes():
    params = moge.init_moge(jax.random.key(0), vit_kwargs=TINY_VIT)
    img = jnp.asarray(np.random.default_rng(1).random((1, 42, 56, 3)), jnp.float32)
    pts, mlogit = moge.moge_forward(params, img)
    assert pts.shape == (1, 42, 56, 3)
    assert mlogit.shape == (1, 42, 56)
    assert float(pts[..., 2].min()) > 0  # z positive by construction


def test_recover_focal_shift_exact():
    """Noiseless pinhole point map with a z-shift removed: the solver must
    recover focal within 1% and shift within 1e-2."""
    h, w = 60, 80
    f_true = 1.2  # in units of max(h, w) pixels
    fx = f_true * max(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    depth = 2.0 + 0.5 * np.sin(xx / 9.0) + 0.3 * np.cos(yy / 7.0)
    x3 = (xx + 0.5 - w / 2) / fx * depth
    y3 = (yy + 0.5 - h / 2) / fx * depth
    shift_true = 0.7
    pts = np.stack([x3, y3, depth - shift_true], -1)  # affine (shifted) map

    f, s = moge.recover_focal_shift(pts)
    assert f == pytest.approx(f_true, rel=0.01)
    assert s == pytest.approx(shift_true, abs=0.02)


def test_normalized_intrinsics_denormalizes():
    from versecrafter_tpu.geometry.coords import denormalize_intrinsics

    K = moge.normalized_intrinsics(1.2, 480, 640)
    Kd = denormalize_intrinsics(K, 640, 480)
    assert Kd[0, 0] == pytest.approx(1.2 * 640)
    assert Kd[0, 2] == pytest.approx(320.0)
    assert Kd[1, 2] == pytest.approx(240.0)


def test_moge_infer_and_save(tmp_path):
    params = moge.init_moge(jax.random.key(0), vit_kwargs=TINY_VIT)
    img = np.random.default_rng(2).random((42, 56, 3)).astype(np.float32)
    out = moge.infer(params, img)
    assert out["depth"].shape == (42, 56)
    assert out["intrinsics"].shape == (3, 3)
    npz = moge.save_outputs(out, str(tmp_path))
    data = np.load(npz)
    assert data["depth"].dtype == np.float16
    assert data["intrinsic"].shape == (3, 3)


def test_moge_checkpoint_roundtrip(tmp_path):
    params = moge.init_moge(jax.random.key(3), vit_kwargs=TINY_VIT)
    p = str(tmp_path / "ckpt.npz")
    moge.save_checkpoint(params, p)
    template = moge.init_moge(jax.random.key(9), vit_kwargs=TINY_VIT)
    loaded = moge.load_checkpoint(p, template=template)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmenter_fallback_contract(tmp_path):
    rng = np.random.default_rng(5)
    img = np.full((96, 128, 3), 40, np.uint8)
    img[30:70, 40:80] = [200, 50, 50]  # one clear object
    seg = ImageSegmenter()
    dets = seg.segment_image(img, "box.")
    assert len(dets) >= 1
    d = dets[0]
    # the object region is mostly covered
    obj = np.zeros((96, 128), bool)
    obj[30:70, 40:80] = True
    inter = (d.mask & obj).sum()
    assert inter / obj.sum() > 0.6

    paths = seg.save_results(img, dets, str(tmp_path), stem="t")
    import os
    assert os.path.exists(paths["combined"])
    assert os.path.exists(paths["annotations"])
    assert any(k.startswith("mask_01") for k in paths)


def test_moge_dinov2_backbone():
    params = moge.init_moge(jax.random.key(7),
                            vit_kwargs=dict(patch=14, dim=32, depth=2, heads=2),
                            backbone="dinov2")
    img = np.random.default_rng(8).random((42, 56, 3)).astype(np.float32)
    out = moge.infer(params, img)
    assert out["depth"].shape == (42, 56)
    assert np.isfinite(out["depth"]).all()
