"""Scene math for the addon (bpy-free, numpy only; unit-tested).

Covariance <-> Blender-object transforms and the export file formats the
server consumes:

- custom_camera_trajectory.npz: 'extrinsics' [T, 4, 4] = per-frame camera
  matrix_world (Blender c2w; the server converts to OpenCV w2c).
- custom_3D_gaussian_trajectory.json: per-frame {object_id, gaussian_3d:
  {mean, covariance}} in Blender world coords, plus metadata with
  obj_id_to_color_idx (the format read by geometry/render.py).
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np


def cov_to_ellipsoid(cov: np.ndarray, scale_factor: float = 2.0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """cov [3,3] -> (rotation [3,3], per-axis scale [3]) so that a unit
    sphere transformed by R @ diag(scale) matches the scale_factor-sigma
    iso-surface."""
    evals, evecs = np.linalg.eigh(cov)
    evals = np.maximum(evals, 1e-12)
    if np.linalg.det(evecs) < 0:  # keep a right-handed rotation for Blender
        evecs = evecs.copy()
        evecs[:, 0] *= -1
    return evecs, scale_factor * np.sqrt(evals)


def ellipsoid_to_cov(rotation: np.ndarray, scale: np.ndarray,
                     scale_factor: float = 2.0) -> np.ndarray:
    """Inverse of cov_to_ellipsoid: R, per-axis scale -> covariance."""
    s = np.asarray(scale, np.float64) / scale_factor
    return (rotation @ np.diag(s ** 2) @ rotation.T).astype(np.float32)


def camera_fov_x(fx_pixels: float, width: int) -> float:
    """Horizontal FOV (radians) from pixel focal length."""
    return 2.0 * np.arctan(width / (2.0 * fx_pixels))


def cov_from_vertices(vertices_world: np.ndarray, center: np.ndarray,
                      scale_factor: float = 2.0) -> np.ndarray:
    """Vertex-statistics covariance fallback (reference exporter,
    export_blender_custom_trajectories.py:185-202): when an ellipsoid
    object carries no stored eigen-decomposition, recover its covariance
    from the mesh vertex distribution. Vertices uniformly distributed on a
    unit sphere have per-axis variance 1/3, so for a mesh baked at the
    scale_factor-sigma iso-surface: cov = sample_cov / sf^2 * 3."""
    v = (np.asarray(vertices_world, np.float64)
         - np.asarray(center, np.float64))
    sample_cov = np.cov(v.T)
    return (sample_cov / (scale_factor ** 2) * 3.0).astype(np.float32)


def frustum_corners(K: np.ndarray, E: np.ndarray, width: int, height: int,
                    near: float = 0.5) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Camera-frustum wireframe geometry in world space (reference scene
    builder create_camera_frustum, build_4d_control_scene.py:329-392):
    ([5,3] vertices — apex followed by the near-plane quad — and the 8
    wireframe edge index pairs). E is a [4,4] w2c extrinsic; the near
    plane sits along Blender's +Y after the camera->Blender axis swap."""
    K = np.asarray(K, np.float64)
    E = np.asarray(E, np.float64)
    R, t = E[:3, :3], E[:3, 3]
    C = -R.T @ t
    R_cam = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    R_b2w = R.T @ R_cam
    fov_y = 2.0 * np.arctan(height / (2.0 * K[1, 1]))
    h = near * np.tan(fov_y / 2.0)
    w = h * (width / height)
    local = np.array([[0, 0, 0],
                      [-w, near, h], [w, near, h],
                      [w, near, -h], [-w, near, -h]], np.float64)
    world = local @ R_b2w.T + C
    world[0] = C
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return world.astype(np.float32), edges


def frame_plane(K: np.ndarray, E: np.ndarray, width: int, height: int,
                near: float = 0.5):
    """Textured video-frame plane at the camera frustum's near plane
    (reference create_camera_frame_plane, build_4d_control_scene.py:
    396-462): the frustum's four near-plane corners as one quad face with
    the reference's UV assignment — corner order (top-left, top-right,
    bottom-right, bottom-left) against UVs ((0,0),(1,0),(1,1),(0,1)), which
    pairs with a flipud'd image buffer (Blender images store row 0 at the
    bottom). Returns ([4,3] float32 verts, (0,1,2,3) face, [4,2] uvs)."""
    verts, _ = frustum_corners(K, E, width, height, near=near)
    quad = verts[1:5]
    uvs = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    return quad, (0, 1, 2, 3), uvs


def camera_centers(extrinsics: np.ndarray) -> np.ndarray:
    """Per-frame camera centers C = -R^T t from [T,4,4] w2c extrinsics —
    the polyline of the reference's camera-path visualization
    (build_4d_control_scene.py:630-666)."""
    E = np.asarray(extrinsics, np.float64)
    return np.stack([-(e[:3, :3].T @ e[:3, 3]) for e in E]).astype(np.float32)


def export_camera_npz(matrices: Sequence[np.ndarray], path: str) -> str:
    ext = np.stack([np.asarray(m, np.float32) for m in matrices])
    assert ext.shape[1:] == (4, 4), ext.shape
    np.savez(path, extrinsics=ext)
    return path


def export_gaussian_json(
    frames: List[Dict[str, Tuple[np.ndarray, np.ndarray]]],
    obj_id_to_color_idx: Dict[str, int],
    path: str,
    frame_step: int = 1,
) -> str:
    """frames[i] = {object_id: (mean [3], cov [3,3])} in Blender coords."""
    out = {
        "metadata": {
            "num_objects": len(obj_id_to_color_idx),
            "num_frames": len(frames),
            "frame_step": frame_step,
            "description": "Exported ellipsoid Gaussian parameters",
            "obj_id_to_color_idx": obj_id_to_color_idx,
        },
        "frames": [],
    }
    for i, objs in enumerate(frames):
        fr = {"frame_index": i, "objects": []}
        for oid, (mean, cov) in objs.items():
            fr["objects"].append({
                "object_id": str(oid),
                "color_index": obj_id_to_color_idx.get(str(oid), 0),
                "gaussian_3d": {
                    "mean": np.asarray(mean, np.float64).tolist(),
                    "covariance": np.asarray(cov, np.float64).tolist(),
                },
            })
        out["frames"].append(fr)
    with open(path, "w") as f:
        json.dump(out, f)
    return path


def pointcloud_quads(points: np.ndarray, colors: np.ndarray,
                     size: float = 0.004, max_points: int = 200_000
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Background point cloud -> camera-facing quad mesh arrays for fast
    Blender loading: (verts [4N,3], faces [N,4], colors [N,3] 0..1).
    Subsamples above max_points to keep the viewport interactive."""
    n = len(points)
    if n > max_points:
        idx = np.random.default_rng(0).choice(n, max_points, replace=False)
        points, colors = points[idx], colors[idx]
        n = max_points
    du = np.array([size, 0, 0], np.float32)
    dv = np.array([0, 0, size], np.float32)
    corners = np.stack([
        points - du - dv, points + du - dv, points + du + dv, points - du + dv,
    ], axis=1)  # [N,4,3]
    verts = corners.reshape(-1, 3)
    faces = np.arange(4 * n, dtype=np.int64).reshape(n, 4)
    cols = np.asarray(colors, np.float32)
    if cols.max() > 1.5:
        cols = cols / 255.0
    return verts, faces, cols
