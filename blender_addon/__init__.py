"""VerseCrafter-TPU Blender addon: interactive 4D trajectory authoring.

Client for the framework's API server (versecrafter_tpu.serve.api_server),
re-implementing the reference addon's workflow
(/root/reference/blender_addon: preprocess -> load scene -> author
trajectories -> export -> render+generate -> download):

1. Preprocess: upload an image; the server estimates depth, segments
   objects, fits 3D Gaussians.
2. Load scene: background point cloud + per-object ellipsoids + camera.
3. Author: keyframe the camera and the ellipsoids over 81 frames.
4. Postprocess: export trajectories, server renders control maps and
   generates the video; download the result.

bpy-free logic (HTTP client, covariance<->ellipsoid math, export formats)
lives in client.py / scene_math.py so it is unit-testable outside Blender.
"""

bl_info = {
    "name": "VerseCrafter TPU",
    "author": "versecrafter-tpu",
    "version": (0, 1, 0),
    "blender": (3, 6, 0),
    "location": "View3D > Sidebar > VerseCrafter",
    "description": "Controllable video generation: author 4D trajectories",
    "category": "3D View",
}


def register():
    from . import operators, panels, properties

    properties.register()
    operators.register()
    panels.register()


def unregister():
    from . import operators, panels, properties

    panels.unregister()
    operators.unregister()
    properties.unregister()
