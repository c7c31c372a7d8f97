"""Standalone trajectory exporter (script variant of the addon operator).

Usage:
  blender scene.blend --python export_custom_trajectories.py -- \
      --out /path/to/outdir [--frames 81]

Writes custom_camera_trajectory.npz (Blender c2w [T,4,4]) and
custom_3D_gaussian_trajectory.json — the formats geometry/render.py loads
(reference parity: inference/blender_script/
export_blender_custom_trajectories.py; output stays in Blender coords).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--sigma", type=float, default=2.0)
    return p.parse_args(argv)


def main():
    import bpy

    from blender_addon.operators import object_covariance
    from blender_addon.scene_math import (
        export_camera_npz, export_gaussian_json)

    args = parse()
    os.makedirs(args.out, exist_ok=True)
    scene = bpy.context.scene
    cam = scene.camera
    assert cam is not None, "no active camera"
    ellipsoids = [o for o in bpy.data.objects if o.get("vc_object_id")]

    mats, frames = [], []
    for f in range(args.frames):
        scene.frame_set(scene.frame_start + f)
        mats.append(np.array(cam.matrix_world, np.float32))
        objs = {}
        for ob in ellipsoids:
            # object_covariance: stored eigen-decomposition, object
            # transform, or vertex-statistics fallback (reference exporter
            # :163-202 precedence)
            objs[str(ob["vc_object_id"])] = (
                np.array(ob.matrix_world.translation, np.float64),
                object_covariance(ob, args.sigma))
        frames.append(objs)

    export_camera_npz(mats, os.path.join(args.out, "custom_camera_trajectory.npz"))
    color_idx = {str(o["vc_object_id"]): int(o.get("vc_color_idx", 0))
                 for o in ellipsoids}
    export_gaussian_json(frames, color_idx,
                         os.path.join(args.out, "custom_3D_gaussian_trajectory.json"))
    print(f"exported {args.frames} frames, {len(ellipsoids)} objects -> {args.out}")


if __name__ == "__main__":
    main()
