"""Blender addon bpy-free modules: scene math, export formats, HTTP client.

Key contract: files exported by the addon must load through the renderer's
own loaders (geometry/render.py) — the round trip the reference validates
only by running the whole system.
"""

import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blender_addon.client import ApiClient
from blender_addon.scene_math import (
    camera_fov_x, cov_to_ellipsoid, ellipsoid_to_cov, export_camera_npz,
    export_gaussian_json, pointcloud_quads)


def test_cov_ellipsoid_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 3))
    cov = (A @ A.T + 0.1 * np.eye(3)).astype(np.float32)
    R, scale = cov_to_ellipsoid(cov, scale_factor=2.0)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-5)  # right-handed
    back = ellipsoid_to_cov(R, scale, scale_factor=2.0)
    np.testing.assert_allclose(back, cov, rtol=1e-4, atol=1e-5)


def test_camera_fov():
    assert camera_fov_x(fx_pixels=640, width=1280) == pytest.approx(
        2 * np.arctan(1.0))


def test_exports_load_through_renderer(tmp_path):
    from versecrafter_tpu.geometry.render import (
        load_camera_trajectory, load_gaussian_trajectory)

    rng = np.random.default_rng(1)
    mats = []
    for _ in range(5):
        q = rng.standard_normal((3, 3))
        u, _, vt = np.linalg.svd(q)
        R = u @ vt
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R * np.sign(np.linalg.det(R))
        m[:3, 3] = rng.standard_normal(3)
        mats.append(m)
    cam_path = export_camera_npz(mats, str(tmp_path / "cam.npz"))
    w2cs = load_camera_trajectory(cam_path)
    assert w2cs.shape == (5, 4, 4)
    np.testing.assert_allclose(
        w2cs[0] @ np.linalg.inv(w2cs[0]), np.eye(4), atol=1e-4)

    frames = []
    for t in range(5):
        cov = np.diag([0.1, 0.2, 0.3]).astype(np.float64)
        frames.append({"1": (np.array([0.0, 1.0, t * 0.1]), cov),
                       "2": (np.array([1.0, 0.0, 0.0]), cov * 2)})
    gj = export_gaussian_json(frames, {"1": 0, "2": 1}, str(tmp_path / "g.json"))
    means, covs, present, colors, obj_ids = load_gaussian_trajectory(gj)
    assert means.shape == (5, 2, 3)
    assert present.all()
    np.testing.assert_allclose(means[3, 0], [0.0, 1.0, 0.3], atol=1e-6)
    np.testing.assert_allclose(covs[0, 1], np.diag([0.2, 0.4, 0.6]), atol=1e-6)
    assert obj_ids == ["1", "2"]


def test_pointcloud_quads():
    pts = np.zeros((10, 3), np.float32)
    pts[:, 0] = np.arange(10)
    cols = np.full((10, 3), 128.0, np.float32)
    verts, faces, qc = pointcloud_quads(pts, cols, size=0.01)
    assert verts.shape == (40, 3)
    assert faces.shape == (10, 4)
    assert qc.max() <= 1.0  # normalized from 0..255


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    from versecrafter_tpu.serve.api_server import ApiServer, build_router
    from versecrafter_tpu.serve.http import make_server, serve_forever_in_thread

    wd = tmp_path_factory.mktemp("client_wd")
    server = ApiServer(workdir=str(wd))
    httpd = make_server(build_router(server), "127.0.0.1", 0)
    serve_forever_in_thread(httpd)
    yield f"http://127.0.0.1:{httpd.server_address[1]}", str(wd)
    httpd.shutdown()


def test_client_upload_download_roundtrip(live_server, tmp_path):
    base, wd = live_server
    client = ApiClient(base)
    assert client.health()["status"] == "ok"

    src = tmp_path / "data.bin"
    src.write_bytes(os.urandom(5000))
    client.upload(str(src), "data.bin")
    out = tmp_path / "back.bin"
    client.download("data.bin", str(out))
    assert out.read_bytes() == src.read_bytes()
    # chunked download path
    out2 = tmp_path / "back2.bin"
    client.download("data.bin", str(out2), chunked=True)
    assert out2.read_bytes() == src.read_bytes()


def test_client_poll_task(live_server):
    base, wd = live_server
    client = ApiClient(base)
    # render task with a missing file -> FAILED quickly, poll surfaces it
    tid = client.start("render", image="missing.png",
                       depth_npz="missing.npz",
                       trajectory_npz="missing.npz",
                       ellipsoid_json="missing.json")
    st = client.poll(tid, interval=0.2, timeout=60)
    assert st["status"] == "FAILED"
    assert st["error"]


def test_cov_from_vertices_recovers_covariance():
    """Vertex-statistics fallback (reference exporter :185-202): sampling
    the 2-sigma iso-surface of a known covariance and running the fallback
    recovers that covariance (up to surface-vs-volume sampling bias, which
    the reference's *3 / sf^2 correction absorbs for uniform sphere
    points)."""
    from blender_addon.scene_math import cov_from_vertices

    rng = np.random.default_rng(3)
    A = rng.standard_normal((3, 3))
    cov = A @ A.T + 0.2 * np.eye(3)
    R, scale = cov_to_ellipsoid(cov, scale_factor=2.0)
    # uniform points on the unit sphere -> per-axis variance 1/3
    pts = rng.standard_normal((20000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    center = np.array([1.0, -2.0, 0.5])
    verts = pts * scale @ R.T + center
    rec = cov_from_vertices(verts, center, scale_factor=2.0)
    np.testing.assert_allclose(rec, cov, rtol=0.08, atol=0.02)


def test_frustum_corners_geometry():
    """Frustum apex sits at the camera center; the near-plane quad is
    `near` along the viewing axis with the fov_y-derived extent
    (reference create_camera_frustum :329-362)."""
    from blender_addon.scene_math import camera_centers, frustum_corners

    fx = fy = 500.0
    w, h = 640, 480
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float64)
    rng = np.random.default_rng(5)
    q = rng.standard_normal((3, 3))
    u, _, vt = np.linalg.svd(q)
    R = u @ vt
    R *= np.sign(np.linalg.det(R))
    t = rng.standard_normal(3)
    E = np.eye(4)
    E[:3, :3], E[:3, 3] = R, t
    near = 0.5
    verts, edges = frustum_corners(K, E, w, h, near=near)
    C = -R.T @ t
    np.testing.assert_allclose(verts[0], C, atol=1e-5)
    assert len(edges) == 8
    # quad corners are all at distance sqrt(near^2 + hh^2 + ww^2) from C
    hh = near * np.tan(np.arctan(h / (2 * fy)))
    ww = hh * (w / h)
    expect = np.sqrt(near ** 2 + hh ** 2 + ww ** 2)
    d = np.linalg.norm(verts[1:] - C, axis=1)
    np.testing.assert_allclose(d, expect, rtol=1e-5)
    # camera_centers agrees with the apex
    np.testing.assert_allclose(camera_centers(E[None])[0], C, atol=1e-5)


def test_frame_plane_geometry():
    """The textured frame plane is exactly the frustum's near-plane quad
    with the reference's corner->UV pairing (create_camera_frame_plane
    :396-462): UV (0,0) on the top-left corner, (1,1) bottom-right, and
    the quad's image-space aspect matches width/height."""
    from blender_addon.scene_math import frame_plane, frustum_corners

    fx = fy = 400.0
    w, h = 800, 450
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float64)
    E = np.eye(4)
    near = 0.5
    quad, face, uvs = frame_plane(K, E, w, h, near=near)
    verts, _ = frustum_corners(K, E, w, h, near=near)
    np.testing.assert_allclose(quad, verts[1:5], atol=0)
    assert face == (0, 1, 2, 3)
    np.testing.assert_allclose(
        uvs, [(0, 0), (1, 0), (1, 1), (0, 1)], atol=0)
    # corners 0-1 and 3-2 span the image-width direction, 0-3 the height
    np.testing.assert_allclose(quad[1] - quad[0], quad[2] - quad[3],
                               atol=1e-6)
    # aspect: width extent / height extent == w/h
    wx = np.linalg.norm(quad[1] - quad[0])
    hy = np.linalg.norm(quad[3] - quad[0])
    np.testing.assert_allclose(wx / hy, w / h, rtol=1e-6)
