"""Geometry layer unit tests: coords, unprojection, fitting, rasterizers."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.geometry.coords import (
    CV2BLENDER, blender_c2w_to_opencv_w2c, denormalize_intrinsics,
    opencv_w2c_to_blender_c2w)
from versecrafter_tpu.geometry.gaussians import fit_gaussian, fit_objects_from_depth
from versecrafter_tpu.geometry.pointcloud import unproject_depth
from versecrafter_tpu.geometry.rasterize import (
    composite_by_depth, depth_to_grayscale, merge_masks, project_points,
    raster_ellipsoids, splat_points)
from versecrafter_tpu.geometry.splat import gaussian_density_maps

K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
EYE4 = np.eye(4, dtype=np.float32)


def test_cv2blender_is_rotation():
    assert np.allclose(CV2BLENDER @ CV2BLENDER.T, np.eye(3))
    assert np.isclose(np.linalg.det(CV2BLENDER), 1.0)


def test_blender_opencv_roundtrip():
    rng = np.random.default_rng(0)
    # random valid c2w
    q = rng.standard_normal((3, 3))
    u, _, vt = np.linalg.svd(q)
    R = u @ vt
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R * np.sign(np.linalg.det(R))
    c2w[:3, 3] = rng.standard_normal(3)
    w2c = blender_c2w_to_opencv_w2c(c2w[None])
    back = opencv_w2c_to_blender_c2w(w2c)
    np.testing.assert_allclose(back[0], c2w, rtol=1e-4, atol=1e-5)


def test_denormalize_intrinsics():
    Kn = np.array([[0.9, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32)
    Kd = denormalize_intrinsics(Kn, 640, 480)
    assert Kd[0, 0] == pytest.approx(0.9 * 640)
    assert Kd[1, 2] == pytest.approx(0.5 * 480)
    # already-pixel intrinsics untouched
    np.testing.assert_array_equal(denormalize_intrinsics(K, 64, 48), K)


def test_unproject_project_roundtrip():
    depth = np.full((48, 64), 2.5, np.float32)
    pts = unproject_depth(depth, K)
    u, v, z = project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(EYE4))
    yy, xx = np.mgrid[0:48, 0:64]
    np.testing.assert_allclose(np.asarray(u).reshape(48, 64), xx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v).reshape(48, 64), yy, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), 2.5, atol=1e-5)


def test_fit_gaussian_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((500, 3)) @ np.diag([1.0, 2.0, 0.5]) + [1, 2, 3]
    mean, cov = fit_gaussian(pts.astype(np.float32))
    np.testing.assert_allclose(mean, pts.mean(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cov, np.cov(pts.T) + 1e-6 * np.eye(3),
                               rtol=1e-3, atol=1e-3)


def test_splat_single_point():
    pts = jnp.asarray([[0.0, 0.0, 2.0]])  # projects to principal point
    cols = jnp.asarray([[255.0, 0.0, 0.0]])
    rgb, depth, mask = splat_points(pts, cols, jnp.asarray(K), jnp.asarray(EYE4),
                                    48, 64, radius_px=1.2)
    assert bool(mask[24, 32])
    assert float(depth[24, 32]) == pytest.approx(2.0)
    np.testing.assert_allclose(np.asarray(rgb[24, 32]), [255, 0, 0])
    assert int(np.asarray(mask).sum()) <= 9  # small footprint


def test_splat_zbuffer_front_wins():
    pts = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]])
    cols = jnp.asarray([[0.0, 255.0, 0.0], [0.0, 0.0, 255.0]])
    rgb, depth, _ = splat_points(pts, cols, jnp.asarray(K), jnp.asarray(EYE4),
                                 48, 64)
    assert float(depth[24, 32]) == pytest.approx(2.0)
    np.testing.assert_allclose(np.asarray(rgb[24, 32]), [0, 0, 255])


def test_raster_sphere():
    # unit-variance isotropic gaussian at z=10 with scale 1 => radius 1 sphere
    means = jnp.asarray([[0.0, 0.0, 10.0]])
    covs = jnp.asarray([np.eye(3, dtype=np.float32)])
    colors = jnp.asarray([[1.0, 0.0, 0.0]])
    present = jnp.asarray([True])
    rgb, depth, mask = raster_ellipsoids(means, covs, colors, present,
                                         jnp.asarray(K), jnp.asarray(EYE4),
                                         48, 64, scale_factor=1.0)
    # front of sphere at z=9 at the image center
    assert float(depth[24, 32]) == pytest.approx(9.0, abs=1e-2)
    assert bool(mask[24, 32])
    # silhouette radius ~ f * r / sqrt(z^2 - r^2) ~ 10.05 px
    area = float(np.asarray(mask).sum())
    assert area == pytest.approx(np.pi * 10.05 ** 2, rel=0.1)
    # red-ish shading (ambient+diffuse on red base, white specular)
    cpix = np.asarray(rgb[24, 32]) / 255.0
    assert cpix[0] > cpix[1] and cpix[0] > 0.4


def test_raster_ellipsoid_absent_object():
    means = jnp.asarray([[0.0, 0.0, 10.0]])
    covs = jnp.asarray([np.eye(3, dtype=np.float32)])
    rgb, depth, mask = raster_ellipsoids(
        means, covs, jnp.asarray([[1.0, 0, 0]]), jnp.asarray([False]),
        jnp.asarray(K), jnp.asarray(EYE4), 48, 64)
    assert not np.asarray(mask).any()


def test_gaussian_density_peak_at_projection():
    means = jnp.asarray([[0.5, -0.2, 4.0]])
    covs = jnp.asarray([np.eye(3, dtype=np.float32) * 0.01])
    dens, z, valid = gaussian_density_maps(
        means, covs, jnp.asarray([True]), jnp.asarray(K), jnp.asarray(EYE4),
        48, 64)
    assert bool(valid[0]) and float(z[0]) == pytest.approx(4.0)
    d = np.asarray(dens[0])
    v, u = np.unravel_index(d.argmax(), d.shape)
    assert u == pytest.approx(100 * 0.5 / 4 + 32, abs=1.0)
    assert v == pytest.approx(100 * -0.2 / 4 + 24, abs=1.0)
    assert d.max() == pytest.approx(1.0)


def test_composite_and_masks():
    bgd = jnp.asarray([[2.0, 0.0], [3.0, 3.0]])
    fgd = jnp.asarray([[1.0, 1.0], [4.0, 0.0]])
    bgm = bgd > 0
    fgm = fgd > 0
    bgr = jnp.zeros((2, 2, 3))
    fgr = jnp.ones((2, 2, 3))
    rgb, depth = composite_by_depth(bgr, bgd, fgr, fgd, fgm)
    # fg closer at (0,0); bg hole at (0,1) -> fg; fg farther at (1,0) -> bg
    np.testing.assert_array_equal(np.asarray(depth), [[1, 1], [3, 3]])
    m = np.asarray(merge_masks(bgd, fgd, bgm, fgm))
    # (0,0): fg visible -> True; (0,1): bg hole -> fg True
    # (1,0): fg behind -> bg present -> False; (1,1): bg present, no fg -> False
    np.testing.assert_array_equal(m, [[True, True], [False, False]])


def test_depth_grayscale_closer_is_lighter():
    d = jnp.asarray([[1.0, 10.0, 0.0]])
    g = np.asarray(depth_to_grayscale(d, 1.0, 10.0))
    assert g[0, 0] > g[0, 1]
    assert g[0, 2] == 0.0
