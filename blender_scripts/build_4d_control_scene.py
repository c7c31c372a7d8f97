"""Standalone scene builder (script variant of the addon's load_scene).

Usage:
  blender --python build_4d_control_scene.py -- \
      --npz depth_intrinsics.npz --gaussians gaussian_params.json \
      [--image input.png] [--trajectory custom_camera_trajectory.npz \
       --show_frustum --show_camera_path]

Re-implements the reference's inference/blender_script/
build_4d_control_scene.py capability: background point-cloud quads,
ellipsoids with vc_object_id custom properties, camera with FOV from fx,
plus the optional frustum snapshots / camera-path polyline visualization
(reference :329-462 and :630-666; geometry in the bpy-free
blender_addon.scene_math so it is unit-testable without Blender).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--npz", required=True)
    p.add_argument("--gaussians", required=True)
    p.add_argument("--image", default="")
    p.add_argument("--point_size", type=float, default=0.004)
    p.add_argument("--sigma", type=float, default=2.0)
    # visualization extras (reference config block :36-64)
    p.add_argument("--trajectory", default="",
                   help="custom_camera_trajectory.npz to visualize "
                        "(Blender c2w [T,4,4]); frustums/path need it")
    p.add_argument("--show_frustum", action="store_true",
                   help="wireframe camera frustums at snapshot frames "
                        "(reference SHOW_CAMERA_FRUSTUM)")
    p.add_argument("--show_camera_path", action="store_true",
                   help="camera-center polyline curve "
                        "(reference SHOW_CAMERA_PATH)")
    p.add_argument("--num_snapshots", type=int, default=5,
                   help="frustum snapshot count (reference "
                        "NUM_SNAPSHOT_FRAMES)")
    p.add_argument("--frustum_size", type=float, default=0.5,
                   help="near-plane distance (reference "
                        "CAMERA_FRUSTUM_SIZE)")
    p.add_argument("--path_radius", type=float, default=0.002,
                   help="path curve bevel radius (reference "
                        "CAMERA_PATH_RADIUS)")
    p.add_argument("--show_camera_frames", action="store_true",
                   help="textured video-frame planes at the frustum near "
                        "planes (reference SHOW_CAMERA_FRAMES / "
                        "create_camera_frame_plane :396-462)")
    p.add_argument("--frames", default="",
                   help="video-frame source for --show_camera_frames: a "
                        "directory of images (sorted) or an mp4; falls "
                        "back to texturing every plane with --image")
    p.add_argument("--frame_opacity", type=float, default=0.8,
                   help="frame-plane alpha (reference CAMERA_FRAME_OPACITY)")
    return p.parse_args(argv)


def _emission_material(name, color=(1.0, 1.0, 0.0, 1.0), strength=2.0):
    """Bright unlit wireframe material (reference :370-384)."""
    import bpy

    mat = bpy.data.materials.new(name=name)
    mat.use_nodes = True
    nodes, links = mat.node_tree.nodes, mat.node_tree.links
    for n in list(nodes):
        nodes.remove(n)
    out = nodes.new("ShaderNodeOutputMaterial")
    emit = nodes.new("ShaderNodeEmission")
    emit.inputs["Color"].default_value = color
    emit.inputs["Strength"].default_value = strength
    links.new(emit.outputs["Emission"], out.inputs["Surface"])
    return mat


def add_camera_frustums(extrinsics, K, width, height, num_snapshots,
                        near):
    """Wireframe frustum meshes at evenly spaced snapshot frames
    (reference create_camera_frustum, build_4d_control_scene.py:329-392)."""
    import bpy
    import numpy as np

    from blender_addon.scene_math import frustum_corners

    n = len(extrinsics)
    idxs = (np.linspace(0, n - 1, min(num_snapshots, n), dtype=int)
            .tolist())
    for si, fi in enumerate(idxs):
        verts, edges = frustum_corners(K, extrinsics[fi], width, height,
                                       near=near)
        mesh = bpy.data.meshes.new(f"CameraFrustum_{si}")
        mesh.from_pydata([tuple(map(float, v)) for v in verts], edges, [])
        mesh.update()
        obj = bpy.data.objects.new(f"Camera_{si}", mesh)
        bpy.context.scene.collection.objects.link(obj)
        obj.data.materials.append(_emission_material(f"CameraMat_{si}"))


def _load_frames(source, image_path, idxs):
    """RGB uint8 frames for the snapshot indices: a directory of images
    (sorted, indexed per snapshot frame), an mp4 (imageio), or the single
    input image repeated."""
    import numpy as np

    if source and os.path.isdir(source):
        import bpy
        names = sorted(os.listdir(source))
        out = []
        for fi in idxs:
            img = bpy.data.images.load(
                os.path.join(source, names[min(fi, len(names) - 1)]))
            w, h = img.size
            px = np.array(img.pixels[:], np.float32).reshape(h, w, 4)
            bpy.data.images.remove(img)
            # bpy loads bottom-up; return top-down rows like a video reader
            out.append((np.flipud(px[..., :3]) * 255).astype(np.uint8))
        return out
    if source:
        import imageio.v2 as imageio
        rd = imageio.get_reader(source)
        frames = [f for f in rd]
        rd.close()
        return [np.asarray(frames[min(fi, len(frames) - 1)])[..., :3]
                for fi in idxs]
    if image_path:
        import bpy
        img = bpy.data.images.load(image_path)
        w, h = img.size
        px = np.array(img.pixels[:], np.float32).reshape(h, w, 4)
        bpy.data.images.remove(img)
        still = (np.flipud(px[..., :3]) * 255).astype(np.uint8)
        return [still for _ in idxs]
    raise SystemExit("--show_camera_frames needs --frames or --image")


def add_camera_frame_planes(extrinsics, K, width, height, num_snapshots,
                            near, frames_source, image_path, opacity):
    """Textured video-frame planes at the frustum near planes (reference
    create_camera_frame_plane, build_4d_control_scene.py:396-462): one quad
    per snapshot, UV-mapped to that snapshot's video frame, emission +
    alpha-blended principled material."""
    import bpy
    import numpy as np

    from blender_addon.scene_math import frame_plane

    n = len(extrinsics)
    idxs = (np.linspace(0, n - 1, min(num_snapshots, n), dtype=int)
            .tolist())
    frames = _load_frames(frames_source, image_path, idxs)
    for si, (fi, rgb) in enumerate(zip(idxs, frames)):
        verts, face, uvs = frame_plane(K, extrinsics[fi], width, height,
                                       near=near)
        mesh = bpy.data.meshes.new(f"CameraFrame_{si}")
        mesh.from_pydata([tuple(map(float, v)) for v in verts], [], [face])
        mesh.update()
        if not mesh.uv_layers:
            mesh.uv_layers.new(name="UVMap")
        uv = mesh.uv_layers[0]
        for i, loop in enumerate(mesh.loops):
            uv.data[loop.index].uv = tuple(map(float, uvs[i]))
        obj = bpy.data.objects.new(f"CameraFrame_{si}", mesh)
        bpy.context.scene.collection.objects.link(obj)

        fh, fw = rgb.shape[:2]
        img = bpy.data.images.new(f"CameraFrameImage_{si}", width=fw,
                                  height=fh, alpha=True)
        rgba = np.empty((fh, fw, 4), np.float32)
        rgba[..., :3] = np.flipud(rgb).astype(np.float32) / 255.0
        rgba[..., 3] = opacity
        img.pixels = rgba.ravel()
        img.pack()

        mat = bpy.data.materials.new(name=f"CameraFrameMat_{si}")
        mat.use_nodes = True
        nodes, links = mat.node_tree.nodes, mat.node_tree.links
        for nd in list(nodes):
            nodes.remove(nd)
        out = nodes.new("ShaderNodeOutputMaterial")
        pr = nodes.new("ShaderNodeBsdfPrincipled")
        tex = nodes.new("ShaderNodeTexImage")
        tex.image = img
        pr.inputs["Alpha"].default_value = opacity
        pr.inputs["Emission Strength"].default_value = 1.0
        links.new(tex.outputs["Color"], pr.inputs["Base Color"])
        links.new(tex.outputs["Color"], pr.inputs["Emission Color"])
        links.new(tex.outputs["Alpha"], pr.inputs["Alpha"])
        links.new(pr.outputs["BSDF"], out.inputs["Surface"])
        mat.blend_method = "BLEND"
        mat.show_transparent_back = True
        obj.data.materials.append(mat)


def add_camera_path(extrinsics, radius):
    """Beveled polyline through the camera centers (reference camera-path
    viz, build_4d_control_scene.py:649-666)."""
    import bpy

    from blender_addon.scene_math import camera_centers

    centers = camera_centers(extrinsics)
    if len(centers) < 2:
        return
    curve = bpy.data.curves.new(name="CamPath", type="CURVE")
    curve.dimensions = "3D"
    spline = curve.splines.new("POLY")
    spline.points.add(len(centers) - 1)
    for i, c in enumerate(centers):
        spline.points[i].co = (float(c[0]), float(c[1]), float(c[2]), 1.0)
    curve.bevel_depth = radius
    curve.bevel_resolution = 2
    obj = bpy.data.objects.new("CamPath", curve)
    bpy.context.scene.collection.objects.link(obj)


def main():
    import bpy
    import numpy as np

    from blender_addon import operators, panels, properties

    args = parse()
    try:
        properties.register()
        operators.register()
    except Exception:
        pass  # already registered

    s = bpy.context.scene.versecrafter
    s.workdir = os.path.dirname(os.path.abspath(args.npz))
    s.image_path = args.image
    s.point_size = args.point_size
    s.ellipsoid_sigma = args.sigma

    # load_scene expects the canonical filenames in workdir
    import shutil
    wd = bpy.path.abspath(s.workdir)
    for src, name in ((args.npz, "depth_intrinsics.npz"),
                      (args.gaussians, "gaussian_params.json")):
        dst = os.path.join(wd, name)
        if os.path.abspath(src) != dst:
            shutil.copy(src, dst)
    bpy.ops.versecrafter.load_scene()

    if args.trajectory and (args.show_frustum or args.show_camera_path
                            or args.show_camera_frames):
        # the trajectory npz stores Blender c2w; the viz helpers consume
        # w2c extrinsics (the reference builder's convention, :638-642)
        traj = np.load(args.trajectory)["extrinsics"].astype(np.float64)
        w2c = np.stack([np.linalg.inv(m) for m in traj])
        depth_npz = np.load(os.path.join(wd, "depth_intrinsics.npz"))
        K = depth_npz["intrinsics"]
        K = K[0] if K.ndim == 3 else K
        h, w = depth_npz["depth"].shape[-2:]
        if abs(float(K[0, 0])) < 10:  # normalized intrinsics
            K = K * np.array([[w, 1, w], [1, h, h], [1, 1, 1]], np.float64)
        if args.show_frustum:
            add_camera_frustums(w2c, K, w, h, args.num_snapshots,
                                args.frustum_size)
        if args.show_camera_path:
            add_camera_path(w2c, args.path_radius)
        if args.show_camera_frames:
            add_camera_frame_planes(w2c, K, w, h, args.num_snapshots,
                                    args.frustum_size, args.frames,
                                    args.image, args.frame_opacity)
    print("scene built")


if __name__ == "__main__":
    main()
