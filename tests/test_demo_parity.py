"""Golden-file parity tests against the reference demo_data intermediates.

The reference ships per-stage golden outputs for two demo clips (SURVEY.md
§4). These tests regenerate stage outputs with this framework and compare:

- gaussian fitting: means/covs vs the shipped gaussian_params.json
- control-map rendering: a few frames vs the shipped mp4s (PSNR / IoU —
  mp4s are crf18-compressed, exact match is impossible by construction)

Heavy renders run at a subsampled frame set to keep CPU CI tolerable.
"""

import json
import os
from pathlib import Path

import cv2
import numpy as np
import pytest

DEMO = Path("/root/reference/demo_data/dc58debb-191d-50cb-8ba1-a5afdeec1808_0000091_0000172")

pytestmark = pytest.mark.skipif(not DEMO.exists(), reason="demo data not mounted")


def _read_frames(path, idxs):
    if not Path(path).exists():
        pytest.skip(f"golden video not shipped in demo_data: {Path(path).name}")
    cap = cv2.VideoCapture(str(path))
    frames = {}
    i = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        if i in idxs:
            frames[i] = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    return [frames[i] for i in idxs]


def test_gaussian_fit_matches_reference_json(tmp_path):
    from versecrafter_tpu.geometry.gaussians import process_single_image

    out = process_single_image(
        str(DEMO / "estimated_depth/depth_intrinsics.npz"),
        str(DEMO / "object_mask/masks"),
        str(tmp_path),
    )
    with open(DEMO / "fitted_3D_gaussian/gaussian_params.json") as f:
        ref = json.load(f)

    assert out["num_objects"] == ref["num_objects"]
    for oid, rp in ref["gaussian_params"].items():
        got = out["gaussian_params"][int(oid)]
        np.testing.assert_allclose(got["mean"], rp["mean"], rtol=0.05, atol=0.02)
        np.testing.assert_allclose(got["cov"], rp["cov"], rtol=0.15, atol=0.01)
        assert got["label"] == rp["label"]


@pytest.fixture(scope="module")
def demo_inputs():
    from versecrafter_tpu.geometry.pointcloud import load_background_from_files
    from versecrafter_tpu.geometry.render import (
        load_camera_trajectory, load_gaussian_trajectory)

    pts, cols, K, h, w = load_background_from_files(
        str(DEMO / "0001.png"),
        str(DEMO / "estimated_depth/depth_intrinsics.npz"),
        str(DEMO / "object_mask/masks"))
    w2cs = load_camera_trajectory(str(DEMO / "camera_object_0/custom_camera_trajectory.npz"))
    means, covs, present, ocolors, _ = load_gaussian_trajectory(
        str(DEMO / "camera_object_0/custom_3D_gaussian_trajectory.json"))
    return pts, cols, K, h, w, w2cs, means, covs, present, ocolors


@pytest.fixture(scope="module")
def rendered(demo_inputs):
    """Render a 9-frame subsample of the demo trajectory."""
    from versecrafter_tpu.geometry.render import render_control_maps

    pts, cols, K, h, w, w2cs, means, covs, present, ocolors = demo_inputs
    idxs = list(range(0, 81, 10))
    vids = render_control_maps(
        pts, cols, K, w2cs[idxs], means[idxs], covs[idxs], present[idxs],
        ocolors, (h, w))
    return idxs, vids


def test_render_batching_invariance(demo_inputs, rendered):
    """The two-pass batched render is exact under re-batching: frame_batch=4
    over 9 frames (two full batches + a padded tail, exercising tail
    slicing in BOTH passes and the per-batch depth-range accumulation)
    must reproduce the single-padded-batch default bit-for-bit."""
    from versecrafter_tpu.geometry.render import render_control_maps

    pts, cols, K, h, w, w2cs, means, covs, present, ocolors = demo_inputs
    idxs, vids = rendered
    rebatched = render_control_maps(
        pts, cols, K, w2cs[idxs], means[idxs], covs[idxs], present[idxs],
        ocolors, (h, w), frame_batch=4)
    assert set(rebatched) == set(vids)
    for k in vids:
        np.testing.assert_array_equal(rebatched[k], vids[k], err_msg=k)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


# Thresholds reflect what the renderer measures after the pytorch3d
# half-pixel convention fix (rasterize.py): per-frame background-depth PSNR
# is 36-42 dB and mask IoU 0.997-0.999 on BOTH demo clips, flat across the
# trajectory (no later-frame droop; crf18 mp4 compression is the remaining
# error floor). Margins below the measured minima guard against codec/
# platform jitter without masking regressions.

def test_background_rgb_parity(rendered):
    idxs, vids = rendered
    ref = _read_frames(DEMO / "camera_object_0/rendering_4D_maps/background_RGB.mp4", idxs)
    psnrs = [_psnr(vids["background_RGB"][i], r) for i, r in enumerate(ref)]
    assert psnrs[0] > 25.0, psnrs
    assert np.mean(psnrs) > 25.0, psnrs


def test_background_depth_parity(rendered):
    idxs, vids = rendered
    ref = _read_frames(DEMO / "camera_object_0/rendering_4D_maps/background_depth.mp4", idxs)
    psnrs = [_psnr(vids["background_depth"][i], r) for i, r in enumerate(ref)]
    assert min(psnrs) > 30.0, psnrs
    assert np.mean(psnrs) > 34.0, psnrs  # measures ~39


def test_merged_mask_parity(rendered):
    idxs, vids = rendered
    ref = _read_frames(DEMO / "camera_object_0/rendering_4D_maps/merged_mask.mp4", idxs)
    ious = []
    for i, r in enumerate(ref):
        got = vids["merged_mask"][i][..., 0] > 127
        want = r[..., 0] > 127
        inter = (got & want).sum()
        union = (got | want).sum()
        ious.append(inter / max(union, 1))
    assert min(ious) > 0.985, ious  # measures 0.997+ on every frame


def test_gaussian_rgb_parity(rendered):
    idxs, vids = rendered
    ref = _read_frames(DEMO / "camera_object_0/rendering_4D_maps/3D_gaussian_RGB.mp4", idxs)
    psnrs = [_psnr(vids["3D_gaussian_RGB"][i], r) for i, r in enumerate(ref)]
    assert np.mean(psnrs) > 45.0, psnrs  # measures ~51


def test_gaussian_depth_parity(rendered):
    idxs, vids = rendered
    ref = _read_frames(DEMO / "camera_object_0/rendering_4D_maps/3D_gaussian_depth.mp4", idxs)
    psnrs = [_psnr(vids["3D_gaussian_depth"][i], r) for i, r in enumerate(ref)]
    assert np.mean(psnrs) > 33.0, psnrs  # measures ~37


DEMO2 = Path("/root/reference/demo_data/LXKcD2zSPMc_0351466_0353266_0001469_0001550")


@pytest.mark.skipif(not DEMO2.exists(), reason="second demo clip not mounted")
def test_gaussian_fit_second_clip(tmp_path):
    from versecrafter_tpu.geometry.gaussians import process_single_image

    out = process_single_image(
        str(DEMO2 / "estimated_depth/depth_intrinsics.npz"),
        str(DEMO2 / "object_mask/masks"),
        str(tmp_path))
    with open(DEMO2 / "fitted_3D_gaussian/gaussian_params.json") as f:
        ref = json.load(f)
    assert out["num_objects"] == ref["num_objects"]
    for oid, rp in ref["gaussian_params"].items():
        got = out["gaussian_params"][int(oid)]
        np.testing.assert_allclose(got["mean"], rp["mean"], rtol=0.05, atol=0.02)
        np.testing.assert_allclose(got["cov"], rp["cov"], rtol=0.15, atol=0.01)


@pytest.mark.skipif(not DEMO2.exists(), reason="second demo clip not mounted")
def test_mask_and_depth_parity_second_clip():
    """The second clip has the larger camera sweep — the frames where the
    half-pixel rasterization convention matters most (frame-80 IoU was 0.83
    before the fix, 0.999 after)."""
    from versecrafter_tpu.geometry.pointcloud import load_background_from_files
    from versecrafter_tpu.geometry.render import (
        load_camera_trajectory, load_gaussian_trajectory, render_control_maps)

    pts, cols, K, h, w = load_background_from_files(
        str(DEMO2 / "0001.png"),
        str(DEMO2 / "estimated_depth/depth_intrinsics.npz"),
        str(DEMO2 / "object_mask/masks"))
    w2cs = load_camera_trajectory(
        str(DEMO2 / "camera_object_0/custom_camera_trajectory.npz"))
    means, covs, present, ocolors, _ = load_gaussian_trajectory(
        str(DEMO2 / "camera_object_0/custom_3D_gaussian_trajectory.json"))
    idxs = [0, 40, 80]
    vids = render_control_maps(pts, cols, K, w2cs[idxs], means[idxs],
                               covs[idxs], present[idxs], ocolors, (h, w))
    ref = _read_frames(
        DEMO2 / "camera_object_0/rendering_4D_maps/merged_mask.mp4", idxs)
    ious = []
    for i, r in enumerate(ref):
        got = vids["merged_mask"][i][..., 0] > 127
        want = r[..., 0] > 127
        ious.append((got & want).sum() / max((got | want).sum(), 1))
    assert min(ious) > 0.985, ious  # measures 0.997+ incl frame 80

    refd = _read_frames(
        DEMO2 / "camera_object_0/rendering_4D_maps/background_depth.mp4", idxs)
    psnrs = [_psnr(vids["background_depth"][i], r) for i, r in enumerate(refd)]
    assert min(psnrs) > 28.0, psnrs  # measures 32-34 incl frame 80
