"""Addon settings (scene-attached property group).

Mirrors the reference addon's property surface
(/root/reference/blender_addon/properties.py:26-186): server url, proxy
cookie, prompts, generation knobs, per-step completion flags.
"""

import bpy


class VerseCrafterSettings(bpy.types.PropertyGroup):
    server_url: bpy.props.StringProperty(
        name="Server URL", default="http://127.0.0.1:8190")
    proxy_cookie: bpy.props.StringProperty(name="Proxy Cookie", default="")
    verify_tls: bpy.props.BoolProperty(name="Verify TLS", default=True)

    image_path: bpy.props.StringProperty(
        name="Input Image", subtype="FILE_PATH", default="")
    text_prompt: bpy.props.StringProperty(
        name="Objects", default="object.",
        description="Text prompt for segmentation, e.g. 'car. person.'")

    prompt: bpy.props.StringProperty(
        name="Prompt", default="a cinematic scene")
    negative_prompt: bpy.props.StringProperty(name="Negative Prompt", default="")
    num_frames: bpy.props.IntProperty(name="Frames", default=81, min=1, max=241)
    fps: bpy.props.IntProperty(name="FPS", default=16, min=1, max=60)
    steps: bpy.props.IntProperty(name="Steps", default=30, min=1, max=100)
    guidance: bpy.props.FloatProperty(name="Guidance", default=5.0, min=0, max=20)
    seed: bpy.props.IntProperty(name="Seed", default=2025)
    height: bpy.props.IntProperty(name="Height", default=480, min=64)
    width: bpy.props.IntProperty(name="Width", default=832, min=64)

    workdir: bpy.props.StringProperty(
        name="Local Folder", subtype="DIR_PATH", default="//versecrafter")
    point_size: bpy.props.FloatProperty(name="Point Size", default=0.004)
    ellipsoid_sigma: bpy.props.FloatProperty(
        name="Ellipsoid Sigma", default=2.0, min=0.5, max=5.0)

    # progress state
    status_text: bpy.props.StringProperty(default="")
    preprocess_done: bpy.props.BoolProperty(default=False)
    scene_loaded: bpy.props.BoolProperty(default=False)
    exported: bpy.props.BoolProperty(default=False)
    generated_video: bpy.props.StringProperty(default="")


def register():
    bpy.utils.register_class(VerseCrafterSettings)
    bpy.types.Scene.versecrafter = bpy.props.PointerProperty(
        type=VerseCrafterSettings)


def unregister():
    del bpy.types.Scene.versecrafter
    bpy.utils.unregister_class(VerseCrafterSettings)
