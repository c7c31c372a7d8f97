"""Addon operators: preprocess / load scene / export / postprocess.

Workflow parity with /root/reference/blender_addon/operators.py (preprocess
:403-594, load scene :597-991, export :1093-1291, postprocess :1359-1582)
using the bpy-free client/scene_math modules. Long-running server tasks poll
via bpy.app.timers so the UI stays responsive.
"""

from __future__ import annotations

import os

import bpy
import numpy as np

from .client import ApiClient
from .scene_math import (
    camera_fov_x, cov_from_vertices, cov_to_ellipsoid, ellipsoid_to_cov,
    export_camera_npz, export_gaussian_json, pointcloud_quads)

COLLECTION = "VerseCrafter"
TOTAL_FRAMES = 81


def _maybe_autosave():
    """Save the .blend before processing when the preference is on
    (reference preferences auto_save_blend, properties.py:211-215)."""
    try:
        prefs = bpy.context.preferences.addons[__package__].preferences
        if getattr(prefs, "auto_save_blend", False) and bpy.data.is_saved:
            bpy.ops.wm.save_mainfile()
    except (KeyError, AttributeError):
        pass  # addon not registered through preferences (e.g. script mode)


def object_covariance(ob, sigma: float) -> np.ndarray:
    """Covariance for one ellipsoid object, reference-parity precedence
    (export_blender_custom_trajectories.py:163-202):

    1. stored eigen-decomposition custom properties (scenes built by the
       reference's standalone script) composed with the user's rotation
       and mean squared scale;
    2. the object's own transform (our loader represents the fit as a
       transformed unit sphere) via ellipsoid_to_cov;
    3. vertex statistics of the baked mesh when the transform is identity
       (covariance lives in the vertices, nothing else to read)."""
    M = ob.matrix_world
    if "eigenvectors" in ob and "eigenvalues" in ob:
        V = np.array(ob["eigenvectors"], np.float64).reshape(3, 3)
        lam = np.array(ob["eigenvalues"], np.float64)
        R_user = np.array(M.to_3x3().normalized(), np.float64)
        scale = np.array(M.to_scale(), np.float64)
        V = R_user @ V
        lam = lam * float(np.mean(scale)) ** 2
        return (V @ np.diag(lam) @ V.T).astype(np.float32)
    R = np.array(M.to_3x3().normalized(), np.float64)
    scale = np.array(M.to_scale(), np.float64)
    if (np.allclose(R, np.eye(3), atol=1e-6)
            and np.allclose(scale, 1.0, atol=1e-6)
            and getattr(ob.data, "vertices", None) is not None
            and len(ob.data.vertices) > 3):
        verts = np.array([M @ v.co for v in ob.data.vertices], np.float64)
        center = np.array(M.translation, np.float64)
        return cov_from_vertices(verts, center)
    return ellipsoid_to_cov(R, scale, sigma)


def _client(ctx) -> ApiClient:
    s = ctx.scene.versecrafter
    return ApiClient(s.server_url, cookie=s.proxy_cookie,
                     verify_tls=s.verify_tls)


def _workdir(ctx) -> str:
    s = ctx.scene.versecrafter
    d = bpy.path.abspath(s.workdir)
    os.makedirs(d, exist_ok=True)
    return d


def _collection():
    col = bpy.data.collections.get(COLLECTION)
    if col is None:
        col = bpy.data.collections.new(COLLECTION)
        bpy.context.scene.collection.children.link(col)
    return col


def _poll_task(client, task_id, scene, on_done):
    """Poll a server task from a UI timer (adaptive 3s interval)."""
    state = {"interval": 3.0}

    def tick():
        try:
            st = client.get(f"/api/status/{task_id}")
        except Exception as e:  # noqa: BLE001 — UI surface
            scene.versecrafter.status_text = f"poll error: {e}"
            # the timer stops here: the busy flag must not outlive it or
            # the panel shows "processing..." forever after one bad poll
            scene.versecrafter.is_processing = False
            return None
        scene.versecrafter.status_text = (
            f"{st['status']} {st['progress']}% {st.get('message') or ''}")
        if st["status"] == "COMPLETED":
            on_done(st)
            return None
        if st["status"] == "FAILED":
            scene.versecrafter.status_text = f"FAILED: {st.get('error')}"
            scene.versecrafter.is_processing = False
            return None
        state["interval"] = min(state["interval"] + 1.0, 10.0)
        return state["interval"]

    bpy.app.timers.register(tick, first_interval=1.0)


class VERSECRAFTER_OT_test_connection(bpy.types.Operator):
    bl_idname = "versecrafter.test_connection"
    bl_label = "Test Connection"

    def execute(self, context):
        try:
            st = _client(context).health()
            self.report({"INFO"}, f"server ok: {st}")
        except Exception as e:  # noqa: BLE001
            self.report({"ERROR"}, f"connection failed: {e}")
            return {"CANCELLED"}
        return {"FINISHED"}


class VERSECRAFTER_OT_preprocess(bpy.types.Operator):
    bl_idname = "versecrafter.preprocess"
    bl_label = "1. Preprocess Image"

    def execute(self, context):
        s = context.scene.versecrafter
        client = _client(context)
        img = bpy.path.abspath(s.image_path)
        if not os.path.isfile(img):
            self.report({"ERROR"}, "set a valid input image")
            return {"CANCELLED"}
        _maybe_autosave()
        name = os.path.basename(img)
        client.upload(img, name)
        task_id = client.start("preprocess", image=name,
                               text_prompt=s.text_prompt,
                               box_threshold=s.box_threshold,
                               min_area_ratio=s.min_area_ratio,
                               max_area_ratio=s.max_area_ratio,
                               model_version=s.depth_model_version,
                               resolution_level=s.resolution_level,
                               use_fp16=s.use_fp16)
        wd = _workdir(context)

        def done(st):
            res = st["result"]
            client.download(res["depth_npz"].replace(os.sep, "/"),
                            os.path.join(wd, "depth_intrinsics.npz"))
            client.download(res["gaussian_params"].replace(os.sep, "/"),
                            os.path.join(wd, "gaussian_params.json"))
            s.preprocess_done = True
            # reference step granularity: depth / segment / gaussian fit
            s.step1_complete = s.step2_complete = s.step3_complete = True
            s.is_processing = False
            s.status_text = f"preprocess done ({res['num_objects']} objects)"
            bpy.ops.versecrafter.load_scene()

        _poll_task(client, task_id, context.scene, done)
        s.is_processing = True
        s.status_text = "preprocessing..."
        return {"FINISHED"}


class VERSECRAFTER_OT_load_scene(bpy.types.Operator):
    bl_idname = "versecrafter.load_scene"
    bl_label = "2. Load Scene"

    def execute(self, context):
        import json

        s = context.scene.versecrafter
        wd = _workdir(context)
        col = _collection()

        data = np.load(os.path.join(wd, "depth_intrinsics.npz"))
        depth = data["depth"].astype(np.float32)
        if depth.ndim == 3:
            depth = depth[0]
        with open(os.path.join(wd, "gaussian_params.json")) as f:
            gp = json.load(f)
        K = np.asarray(gp["camera_info"]["intrinsic"], np.float32)
        h, w = depth.shape
        if abs(K[0, 0]) < 10:  # normalized intrinsics
            K = K * np.array([[w, 1, w], [1, h, h], [1, 1, 1]], np.float32)

        # --- background point cloud (OpenCV cam at origin -> Blender world)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        pts_cv = np.stack([
            (xx - K[0, 2]) / K[0, 0] * depth,
            (yy - K[1, 2]) / K[1, 1] * depth,
            depth,
        ], -1).reshape(-1, 3)
        # Blender: X=cvX, Y=cvZ, Z=-cvY
        pts = np.stack([pts_cv[:, 0], pts_cv[:, 2], -pts_cv[:, 1]], -1)
        valid = np.isfinite(pts).all(1) & (depth.reshape(-1) > 0)
        pts = pts[valid]

        # colors from the source image when Blender can load it
        cols = np.full((len(pts), 3), 0.6, np.float32)
        img_path = bpy.path.abspath(s.image_path)
        if os.path.isfile(img_path):
            im = bpy.data.images.load(img_path, check_existing=True)
            px = np.asarray(im.pixels[:], np.float32).reshape(im.size[1], im.size[0], -1)
            px = px[::-1, :, :3]  # Blender stores bottom-up
            if px.shape[:2] == (h, w):
                cols = px.reshape(-1, 3)[valid]

        verts, faces, qcols = pointcloud_quads(pts, cols, size=s.point_size)
        mesh = bpy.data.meshes.new("vc_background")
        mesh.from_pydata(verts.tolist(), [], faces.tolist())
        attr = mesh.color_attributes.new("Col", "FLOAT_COLOR", "CORNER")
        loop_cols = np.repeat(
            np.concatenate([qcols, np.ones((len(qcols), 1), np.float32)], 1),
            4, axis=0)
        attr.data.foreach_set("color", loop_cols.reshape(-1))
        ob = bpy.data.objects.new("vc_background", mesh)
        col.objects.link(ob)

        # --- ellipsoids from fitted gaussians (cam frame == Blender after flip)
        for oid, obj in gp["gaussian_params"].items():
            mean_cv = np.asarray(obj["mean"], np.float64)
            cov_cv = np.asarray(obj["cov"], np.float64)
            T = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
            mean = T @ mean_cv
            cov = T @ cov_cv @ T.T
            R, scale = cov_to_ellipsoid(cov, s.ellipsoid_sigma)
            bpy.ops.mesh.primitive_uv_sphere_add(radius=1.0, location=mean)
            eob = context.active_object
            eob.name = f"vc_object_{oid}_{obj.get('label', '')}"
            M = np.eye(4)
            M[:3, :3] = R @ np.diag(scale)
            M[:3, 3] = mean
            eob.matrix_world = M.T.tolist()  # mathutils is row-major-compat
            import mathutils
            eob.matrix_world = mathutils.Matrix(M.tolist())
            eob["vc_object_id"] = str(oid)
            eob["vc_color_idx"] = int(gp["obj_id_to_color_idx"].get(str(oid), 0))
            for c2 in eob.users_collection:
                c2.objects.unlink(eob)
            col.objects.link(eob)

        # --- camera from intrinsics
        cam_data = bpy.data.cameras.new("vc_camera")
        cam_data.angle_x = camera_fov_x(float(K[0, 0]), w)
        cam = bpy.data.objects.new("vc_camera", cam_data)
        col.objects.link(cam)
        context.scene.camera = cam
        # Blender camera looks down -Z; OpenCV camera at origin looking +Z
        # (= Blender +Y): rotate -90deg about X
        import mathutils
        cam.matrix_world = mathutils.Matrix.Rotation(np.pi / 2, 4, "X")

        context.scene.frame_start = 1
        context.scene.frame_end = TOTAL_FRAMES
        s.scene_loaded = True
        s.status_text = f"scene loaded: {len(gp['gaussian_params'])} objects"
        return {"FINISHED"}


class VERSECRAFTER_OT_export_trajectories(bpy.types.Operator):
    bl_idname = "versecrafter.export_trajectories"
    bl_label = "3. Export Trajectories"

    def execute(self, context):
        s = context.scene.versecrafter
        wd = _workdir(context)
        scene = context.scene
        cam = scene.camera
        if cam is None:
            self.report({"ERROR"}, "no active camera")
            return {"CANCELLED"}
        col = bpy.data.collections.get(COLLECTION)
        ellipsoids = [o for o in (col.objects if col else [])
                      if o.get("vc_object_id")]

        cams = []
        frames = []
        current = scene.frame_current
        for f in range(TOTAL_FRAMES):
            scene.frame_set(scene.frame_start + f)
            cams.append(np.array(cam.matrix_world, np.float32))
            objs = {}
            for ob in ellipsoids:
                oid = str(ob["vc_object_id"])
                cov = object_covariance(ob, s.ellipsoid_sigma)
                mean = np.array(ob.matrix_world.translation, np.float64)
                objs[oid] = (mean, cov)
            frames.append(objs)
        scene.frame_set(current)

        cam_npz = os.path.join(wd, "custom_camera_trajectory.npz")
        export_camera_npz(cams, cam_npz)
        color_idx = {str(o["vc_object_id"]): int(o.get("vc_color_idx", 0))
                     for o in ellipsoids}
        gj = os.path.join(wd, "custom_3D_gaussian_trajectory.json")
        export_gaussian_json(frames, color_idx, gj)

        client = _client(context)
        client.upload(cam_npz, "custom_camera_trajectory.npz")
        client.upload(gj, "custom_3D_gaussian_trajectory.json")
        s.exported = True
        s.step4_complete = True
        s.status_text = "trajectories exported + uploaded"
        return {"FINISHED"}


class VERSECRAFTER_OT_postprocess(bpy.types.Operator):
    bl_idname = "versecrafter.postprocess"
    bl_label = "4. Render + Generate"

    def execute(self, context):
        s = context.scene.versecrafter
        client = _client(context)
        wd = _workdir(context)
        img_name = os.path.basename(bpy.path.abspath(s.image_path))

        render_id = client.start(
            "render", image=img_name,
            depth_npz="estimated_depth/depth_intrinsics.npz",
            mask_dir="object_mask/masks",
            trajectory_npz="custom_camera_trajectory.npz",
            ellipsoid_json="custom_3D_gaussian_trajectory.json",
            output_dir="rendering_4D_maps", fps=s.fps)

        def after_render(st):
            s.render_done = True
            s.step5_complete = True
            extra = {}
            if s.teacache_threshold > 0:
                extra["teacache_threshold"] = s.teacache_threshold
            if s.cfg_skip_ratio > 0:
                extra["cfg_skip_ratio"] = s.cfg_skip_ratio
            gen_id = client.start(
                "generate",
                rendering_maps_path=st["result"]["output_dir"],
                input_image_path=img_name,
                prompt=s.prompt, negative_prompt=s.negative_prompt,
                height=s.height, width=s.width, num_frames=s.num_frames,
                num_inference_steps=s.steps, guidance_scale=s.guidance,
                seed=s.seed, fps=s.fps, **extra)

            def after_gen(st2):
                remote = st2["result"]["video_path"]
                local = os.path.join(wd, os.path.basename(remote))
                client.download(remote.replace(os.sep, "/"), local,
                                chunked=True)
                s.generated_video = local
                s.generate_done = True
                s.step6_complete = True
                s.is_processing = False
                s.status_text = f"video ready: {local}"

            _poll_task(client, gen_id, context.scene, after_gen)

        _poll_task(client, render_id, context.scene, after_render)
        s.is_processing = True
        s.status_text = "rendering control maps..."
        return {"FINISHED"}


class VERSECRAFTER_OT_open_folder(bpy.types.Operator):
    bl_idname = "versecrafter.open_folder"
    bl_label = "Open Output Folder"

    def execute(self, context):
        import subprocess
        import sys

        wd = _workdir(context)
        opener = {"win32": "explorer", "darwin": "open"}.get(sys.platform, "xdg-open")
        subprocess.Popen([opener, wd])
        return {"FINISHED"}


CLASSES = (
    VERSECRAFTER_OT_test_connection,
    VERSECRAFTER_OT_preprocess,
    VERSECRAFTER_OT_load_scene,
    VERSECRAFTER_OT_export_trajectories,
    VERSECRAFTER_OT_postprocess,
    VERSECRAFTER_OT_open_folder,
)


def register():
    for c in CLASSES:
        bpy.utils.register_class(c)


def unregister():
    for c in reversed(CLASSES):
        bpy.utils.unregister_class(c)
