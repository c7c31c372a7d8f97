"""Standalone scene builder (script variant of the addon's load_scene).

Usage:
  blender --python build_4d_control_scene.py -- \
      --npz depth_intrinsics.npz --gaussians gaussian_params.json \
      [--image input.png]

Re-implements the reference's inference/blender_script/
build_4d_control_scene.py capability: background point-cloud quads,
ellipsoids with vc_object_id custom properties, camera with FOV from fx.
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
    return p.parse_args(argv)


def main():
    import bpy

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
    print("scene built")


if __name__ == "__main__":
    main()
