"""4D control-map rendering pipeline.

Re-implements /root/reference/inference/rendering_4D_control_maps.py:main
(:1171-1379): background point cloud + camera trajectory + per-frame 3D
Gaussian ellipsoids -> the 6 control videos the generation pipeline consumes
by exact filename (background_RGB.mp4, background_depth.mp4,
3D_gaussian_RGB.mp4, 3D_gaussian_depth.mp4, merged_mask.mp4, plus the
background_and_3D_gaussian.mp4 preview).

TPU-native: both rasterizers are jitted XLA programs vmapped over frame
batches; the only host work is file IO and mp4 encoding.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.geometry.coords import blender_c2w_to_opencv_w2c
from versecrafter_tpu.geometry.pointcloud import load_background_from_files
from versecrafter_tpu.geometry.rasterize import (
    composite_by_depth, depth_to_grayscale, global_depth_range, merge_masks,
    raster_ellipsoids, splat_points)
from versecrafter_tpu.geometry.splat import (
    composite_gaussian_projections, object_color)
from versecrafter_tpu.utils.video import save_video


def load_camera_trajectory(trajectory_npz: str) -> np.ndarray:
    """Blender c2w 'extrinsics' [T,4,4] -> OpenCV w2c [T,4,4]."""
    data = np.load(trajectory_npz)
    return blender_c2w_to_opencv_w2c(data["extrinsics"].astype(np.float32))


def load_gaussian_trajectory(json_path: str):
    """custom_3D_gaussian_trajectory.json -> stacked per-frame params.

    Returns (means [T,K,3], covs [T,K,3,3], present [T,K], colors [K,3],
    obj_ids [K])."""
    with open(json_path) as f:
        data = json.load(f)
    color_idx = {str(k): v for k, v in
                 data["metadata"]["obj_id_to_color_idx"].items()}
    obj_ids = sorted(color_idx.keys(), key=lambda s: int(s) if s.isdigit() else s)
    slot = {oid: i for i, oid in enumerate(obj_ids)}
    T = data["metadata"]["num_frames"]
    K = max(len(obj_ids), 1)

    means = np.zeros((T, K, 3), np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 1e-6, (T, K, 1, 1))
    present = np.zeros((T, K), bool)
    for fr in data["frames"]:
        t = fr["frame_index"]
        if t >= T:
            continue
        for obj in fr["objects"]:
            oid = str(obj["object_id"])
            if oid not in slot or obj["gaussian_3d"]["mean"] is None:
                continue
            k = slot[oid]
            means[t, k] = obj["gaussian_3d"]["mean"]
            covs[t, k] = obj["gaussian_3d"]["covariance"]
            present[t, k] = True

    colors = np.stack([object_color(color_idx[oid]) for oid in obj_ids]) \
        if obj_ids else np.zeros((1, 3), np.float32)
    return means, covs, present, colors, obj_ids


def render_control_maps(
    bg_points: np.ndarray,
    bg_colors: np.ndarray,
    K: np.ndarray,
    w2cs: np.ndarray,
    means: np.ndarray,
    covs: np.ndarray,
    present: np.ndarray,
    obj_colors: np.ndarray,
    image_size: Tuple[int, int],
    point_size: float = 0.005,
    ellipsoid_scale: float = 2.5,
    gaussian_threshold: float = 0.003,
    frame_batch: int = 27,
) -> Dict[str, np.ndarray]:
    """Render all control maps. Returns uint8 video arrays [T,H,W,3] keyed by
    output name (without .mp4)."""
    H, W = image_size
    T = len(w2cs)
    radius_px = point_size * min(H, W) / 2.0  # pytorch3d NDC radius -> pixels
    footprint = max(1, int(np.ceil(radius_px)))

    Kj = jnp.asarray(K)
    pts = jnp.asarray(bg_points)
    cols = jnp.asarray(bg_colors, jnp.float32)

    # splat runs per-frame (sort+unique-scatter vmaps poorly; a single frame
    # is already one fast fused program)
    splat_one = jax.jit(lambda w2c: splat_points(
        pts, cols, Kj, w2c, H, W, radius_px=radius_px, footprint=footprint))
    ell_batch = jax.jit(jax.vmap(
        lambda m, c, p, w2c: raster_ellipsoids(
            m, c, jnp.asarray(obj_colors), p, Kj, w2c, H, W,
            scale_factor=ellipsoid_scale)))
    proj_batch = jax.jit(jax.vmap(
        lambda m, c, p, w2c: composite_gaussian_projections(
            m, c, jnp.asarray(obj_colors), p, Kj, w2c, H, W,
            threshold=gaussian_threshold)))

    bg_rgb = np.zeros((T, H, W, 3), np.float32)
    bg_depth = np.zeros((T, H, W), np.float32)
    bg_mask = np.zeros((T, H, W), bool)
    fg_rgb = np.zeros_like(bg_rgb)
    fg_depth = np.zeros_like(bg_depth)
    fg_mask = np.zeros_like(bg_mask)
    g_rgb = np.zeros_like(bg_rgb)
    g_alpha = np.zeros_like(bg_depth)

    for i in range(T):
        r, d, m = splat_one(jnp.asarray(w2cs[i]))
        bg_rgb[i], bg_depth[i], bg_mask[i] = map(np.asarray, (r, d, m))

    for s in range(0, T, frame_batch):
        e = min(s + frame_batch, T)
        w2c_b = jnp.asarray(w2cs[s:e])
        r, d, m = ell_batch(jnp.asarray(means[s:e]), jnp.asarray(covs[s:e]),
                            jnp.asarray(present[s:e]), w2c_b)
        fg_rgb[s:e], fg_depth[s:e], fg_mask[s:e] = map(np.asarray, (r, d, m))
        r, a = proj_batch(jnp.asarray(means[s:e]), jnp.asarray(covs[s:e]),
                          jnp.asarray(present[s:e]), w2c_b)
        g_rgb[s:e], g_alpha[s:e] = np.asarray(r), np.asarray(a)

    # composites & visualizations (reference main steps 7-10)
    comp_rgb, comp_depth = composite_by_depth(
        jnp.asarray(bg_rgb), jnp.asarray(bg_depth), jnp.asarray(fg_rgb),
        jnp.asarray(fg_depth), jnp.asarray(fg_mask))
    dmin, dmax = global_depth_range(
        np.concatenate([bg_depth.ravel(), fg_depth.ravel(),
                        np.asarray(comp_depth).ravel()]))

    bg_gray = np.asarray(depth_to_grayscale(jnp.asarray(bg_depth), dmin, dmax))
    fg_gray = np.asarray(depth_to_grayscale(jnp.asarray(fg_depth), dmin, dmax))
    merged = np.asarray(merge_masks(
        jnp.asarray(bg_depth), jnp.asarray(fg_depth),
        jnp.asarray(bg_mask), jnp.asarray(fg_mask)))

    gauss_rgb = (g_rgb * g_alpha[..., None] * 255.0)

    # background + gaussian preview (blend, then depth-composite vs bg)
    blend = g_rgb * 255.0 * g_alpha[..., None] + bg_rgb * (1 - g_alpha[..., None])
    gvis = g_alpha > 0.001
    prev_rgb, _ = composite_by_depth(
        jnp.asarray(bg_rgb), jnp.asarray(bg_depth), jnp.asarray(blend),
        jnp.asarray(fg_depth), jnp.asarray(gvis))

    def u8(x):
        return np.clip(np.asarray(x), 0, 255).astype(np.uint8)

    def gray3(x):
        return np.repeat(u8(x)[..., None], 3, -1)

    return {
        "background_RGB": u8(bg_rgb),
        "background_depth": gray3(bg_gray),
        "3D_gaussian_RGB": u8(gauss_rgb),
        "3D_gaussian_depth": gray3(fg_gray),
        "merged_mask": np.repeat((merged[..., None] * 255).astype(np.uint8), 3, -1),
        "background_and_3D_gaussian": u8(prev_rgb),
    }


def render_from_files(
    png_path: str,
    npz_path: str,
    mask_dir: Optional[str],
    trajectory_npz: str,
    ellipsoid_json: str,
    output_dir: str,
    point_size: float = 0.005,
    fps: int = 10,
    frame_batch: int = 27,
    progress=None,
) -> Dict[str, str]:
    """End-to-end file contract of rendering_4D_control_maps.py main()."""
    bg_points, bg_colors, K, H, W = load_background_from_files(
        png_path, npz_path, mask_dir)
    w2cs = load_camera_trajectory(trajectory_npz)
    means, covs, present, obj_colors, _ = load_gaussian_trajectory(ellipsoid_json)
    T = min(len(w2cs), len(means))

    videos = render_control_maps(
        bg_points, bg_colors, K, w2cs[:T], means[:T], covs[:T], present[:T],
        obj_colors, (H, W), point_size=point_size, frame_batch=frame_batch)

    os.makedirs(output_dir, exist_ok=True)
    paths = {}
    for name, vid in videos.items():
        p = os.path.join(output_dir, f"{name}.mp4")
        save_video(vid.astype(np.float32) / 255.0, p, fps=fps)
        paths[name] = p
    return paths
