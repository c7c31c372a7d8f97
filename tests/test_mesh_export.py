"""Mesh export: grid triangulation, PLY/GLB writers, moge CLI integration."""

import os
import struct

import numpy as np
import pytest

from versecrafter_tpu.utils import mesh_export as me


def _grid_points(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([xx, yy, np.full((h, w), 2.0, np.float32)], -1)


def test_build_mesh_full_grid():
    h, w = 4, 5
    pts = _grid_points(h, w)
    faces, verts = me.build_mesh_from_map(pts, None, None)
    assert verts.shape == (h * w, 3)
    assert faces.shape == (2 * (h - 1) * (w - 1), 3)
    assert faces.max() < len(verts)
    # every triangle has 3 distinct vertices
    assert (np.sort(faces, -1)[:, :-1] != np.sort(faces, -1)[:, 1:]).all()


def test_build_mesh_masked_compacts_vertices():
    h, w = 4, 4
    pts = _grid_points(h, w)
    mask = np.ones((h, w), bool)
    mask[0, 0] = False  # kills the two triangles touching the corner
    colors = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)
    faces, verts, cols, uvs = me.build_mesh_from_map(
        pts, colors, me.image_uv(h, w), mask)
    assert len(verts) == h * w - 1  # unused corner dropped
    assert len(cols) == len(verts) and len(uvs) == len(verts)
    # compacted indices stay in range and reference the right positions
    assert faces.min() >= 0 and faces.max() < len(verts)
    np.testing.assert_allclose(verts[faces[0]],
                               pts.reshape(-1, 3)[[1, 5, 2]], atol=0)


def test_depth_edge_mask():
    d = np.full((8, 8), 2.0, np.float32)
    d[:, 4:] = 4.0  # a 2x jump
    e = me.depth_edge_mask(d, rtol=0.1)
    assert e[:, 3:5].all()          # both sides of the discontinuity
    assert not e[:, :2].any() and not e[:, 6:].any()


def _parse_ply(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    lines = head.decode().splitlines()
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in lines if l.startswith("element face")][0].split()[-1])
    has_color = any("uchar red" in l for l in lines)
    stride = 12 + (3 if has_color else 0)
    vert = body[: nv * stride]
    xyz = (np.frombuffer(vert, np.uint8).reshape(nv, stride)[:, :12]
           .copy().view("<f4"))
    return nv, nf, xyz.reshape(nv, 3)


def test_save_ply_roundtrip(tmp_path):
    verts = np.arange(15, dtype=np.float32).reshape(5, 3)
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    cols = np.linspace(0, 1, 15, dtype=np.float32).reshape(5, 3)
    p = str(tmp_path / "m.ply")
    me.save_ply(p, verts, faces, cols)
    nv, nf, xyz = _parse_ply(p)
    assert (nv, nf) == (5, 2)
    np.testing.assert_allclose(xyz, verts)


def test_save_glb_structure(tmp_path):
    h, w = 6, 8
    pts = _grid_points(h, w)
    faces, verts, uvs = me.build_mesh_from_map(pts, None, me.image_uv(h, w))
    img = np.random.default_rng(1).integers(0, 255, (h, w, 3), np.uint8)
    p = str(tmp_path / "m.glb")
    me.save_glb(p, verts, faces, vertex_uvs=uvs, texture_rgb=img)

    meta = me.load_glb_meta(p)
    assert meta["asset"]["version"] == "2.0"
    prim = meta["meshes"][0]["primitives"][0]
    pos = meta["accessors"][prim["attributes"]["POSITION"]]
    assert pos["count"] == len(verts) and pos["type"] == "VEC3"
    assert "min" in pos and "max" in pos
    idx = meta["accessors"][prim["indices"]]
    assert idx["count"] == faces.size and idx["componentType"] == 5125
    assert meta["images"][0]["mimeType"] == "image/png"
    assert prim["material"] == 0

    # binary chunk is well-formed: total length in header matches the file
    with open(p, "rb") as f:
        raw = f.read()
    assert struct.unpack("<I", raw[8:12])[0] == len(raw)
    # the embedded PNG decodes back to the texture
    import cv2
    iv = meta["bufferViews"][meta["images"][0]["bufferView"]]
    jlen = struct.unpack("<I", raw[12:16])[0]
    bin_off = 12 + 8 + jlen + 8
    png = raw[bin_off + iv["byteOffset"]: bin_off + iv["byteOffset"] + iv["byteLength"]]
    dec = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(cv2.cvtColor(dec, cv2.COLOR_BGR2RGB), img)


def test_moge_cli_mesh_outputs(tmp_path):
    import cv2

    from versecrafter_tpu.cli import moge_infer

    img = (np.random.default_rng(2).random((42, 56, 3)) * 255).astype(np.uint8)
    ip = str(tmp_path / "in.png")
    cv2.imwrite(ip, img)
    od = str(tmp_path / "out")
    moge_infer.main(["--input", ip, "--output", od])  # no flags -> save all
    for name in ("depth_intrinsics.npz", "depth_gray.png", "depth_vis.png",
                 "mesh.glb", "pointcloud.ply"):
        assert os.path.exists(os.path.join(od, name)), name
    meta = me.load_glb_meta(os.path.join(od, "mesh.glb"))
    pos = meta["accessors"][0]
    assert 0 < pos["count"] <= 42 * 56
