"""Depth unprojection and background point-cloud construction.

Replaces kornia.depth_to_3d_v2 + build_background
(/root/reference/inference/rendering_4D_control_maps.py:908-998): depth map
-> camera-space points -> world -> Blender coords; object masks (dilated)
carve out the background subset.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import cv2
import numpy as np

from versecrafter_tpu.geometry.coords import CV2BLENDER, denormalize_intrinsics


def unproject_depth(depth: np.ndarray, K: np.ndarray,
                    w2c: Optional[np.ndarray] = None) -> np.ndarray:
    """[H, W] depth + pixel intrinsics -> [H*W, 3] world points (OpenCV).

    Matches get_point_cloud_from_depth (fit_3D_gaussian.py:35-92) and
    kornia's depth_to_3d_v2 with normalize_points=False: rays through
    integer pixel coordinates scaled by z-depth."""
    h, w = depth.shape
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    ones = np.ones_like(x)
    pix = np.stack([x, y, ones], 0).reshape(3, -1)
    pts_cam = (np.linalg.inv(K) @ pix) * depth.reshape(1, -1)
    if w2c is None:
        return pts_cam.T.astype(np.float32)
    c2w = np.linalg.inv(w2c)
    pts_h = np.concatenate([pts_cam, np.ones((1, pts_cam.shape[1]))], 0)
    return (c2w @ pts_h)[:3].T.astype(np.float32)


def build_background(
    image: np.ndarray,
    depth: np.ndarray,
    K: np.ndarray,
    object_masks: Optional[np.ndarray] = None,
    dilate_kernel: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """image [H,W,3] uint8 + depth [H,W] + intrinsics (+combined object mask)
    -> (points [N,3] Blender world coords, colors [N,3] uint8).

    Identity extrinsic (camera at origin); masked pixels (dilated, removing
    boundary noise) are excluded; non-finite / extreme points filtered."""
    h, w = depth.shape
    K = denormalize_intrinsics(K, w, h)
    pts_cv = unproject_depth(depth.astype(np.float32), K)
    pts = pts_cv @ CV2BLENDER.T  # to Blender world coords

    keep = np.ones(h * w, bool)
    if object_masks is not None:
        m = (object_masks > 0).astype(np.uint8) * 255
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                           (dilate_kernel, dilate_kernel))
        m = cv2.dilate(m, kernel, iterations=1)
        keep &= ~(m.reshape(-1) > 127)

    keep &= np.isfinite(pts).all(1)
    keep &= (np.abs(pts) < 1e6).all(1)
    return pts[keep], image.reshape(-1, 3)[keep]


def load_background_from_files(png_path: str, npz_path: str, mask_dir: Optional[str],
                               dilate_kernel: int = 10):
    """File-level wrapper matching the reference CLI inputs: RGB png, MoGe
    depth npz ('depth','intrinsic'), mask dir of per-object pngs.
    Returns (points, colors, K_pixels, H, W)."""
    img = cv2.cvtColor(cv2.imread(png_path), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    data = np.load(npz_path)
    depth = data["depth"].astype(np.float32)
    if depth.ndim == 3:
        depth = depth[0]
    K = denormalize_intrinsics(data["intrinsic"].astype(np.float32), w, h)

    combined = None
    if mask_dir is not None:
        combined = np.zeros((h, w), np.uint8)
        for f in sorted(Path(mask_dir).glob("*.png")):
            m = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            m = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            combined |= (m > 127).astype(np.uint8)

    pts, cols = build_background(img, depth, K, combined, dilate_kernel)
    return pts, cols, K, h, w
