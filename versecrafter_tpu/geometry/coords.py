"""Coordinate conventions, centralized.

The reference scatters three frames (OpenCV camera, Blender world, pytorch3d
NDC) across rendering_4D_control_maps.py:59-63,1001-1009, blender
operators.py:686-693 and export_blender_custom_trajectories.py:204-205.
Here is the single tested home for all of them.

Conventions:
- OpenCV camera: X right, Y down, Z forward. Pinhole projection
  u = fx*X/Z + cx, v = fy*Y/Z + cy.
- Blender world (Z-up): X right, Y forward, Z up.
- Blender camera: looks down -Z with +Y up (hence the column flip when
  converting Blender camera-to-world matrices to OpenCV).

Our renderer projects everything with plain OpenCV math — the reference's
pytorch3d NDC detour (sign flips at rendering_4D_control_maps.py:363-366)
exists only to make pytorch3d reproduce exactly this projection.
"""

from __future__ import annotations

import numpy as np

# Blender_X = CV_X, Blender_Y = CV_Z, Blender_Z = -CV_Y
# (rendering_4D_control_maps.py:59-63)
CV2BLENDER = np.array([
    [1, 0, 0],
    [0, 0, 1],
    [0, -1, 0],
], dtype=np.float32)

BLENDER2CV = CV2BLENDER.T


def denormalize_intrinsics(K: np.ndarray, width: int, height: int) -> np.ndarray:
    """MoGe writes normalized intrinsics (fx<10 heuristic,
    fit_3D_gaussian.py:508-512); scale to pixels."""
    K = np.array(K, np.float32)
    if abs(K[0, 0]) < 10 or abs(K[1, 1]) < 10:
        K = K.copy()
        K[0, 0] *= width
        K[1, 1] *= height
        K[0, 2] *= width
        K[1, 2] *= height
    return K


def blender_c2w_to_opencv_w2c(c2w_blender: np.ndarray) -> np.ndarray:
    """[T, 4, 4] Blender camera-to-world -> OpenCV world-to-camera.

    Blender cameras look down -Z with +Y up; negating rotation columns 1:3
    re-expresses the camera axes in OpenCV convention, then invert
    (load_camera_trajectory, rendering_4D_control_maps.py:1001-1009)."""
    c2w = np.array(c2w_blender, np.float64).copy()
    c2w[..., :3, 1:3] *= -1
    return np.linalg.inv(c2w).astype(np.float32)


def opencv_w2c_to_blender_c2w(w2c: np.ndarray) -> np.ndarray:
    """Inverse of blender_c2w_to_opencv_w2c."""
    c2w = np.linalg.inv(np.array(w2c, np.float64))
    c2w[..., :3, 1:3] *= -1
    return c2w.astype(np.float32)
