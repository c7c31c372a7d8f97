"""Addon settings (scene-attached property group).

Mirrors the reference addon's property surface
(/root/reference/blender_addon/properties.py:26-186): server url, proxy
cookie, prompts, generation knobs, per-step completion flags.
"""

import bpy


def _update_num_frames(self, context):
    """Sync the Blender timeline to the generation length (reference
    update_video_length, properties.py:18-23)."""
    scene = context.scene
    scene.frame_start = 1
    scene.frame_end = self.num_frames


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

    # depth model selection (reference properties.py:84-92; the server
    # maps v1/v2 to its MoGe checkpoints via the model_version param)
    depth_model_version: bpy.props.EnumProperty(
        name="Depth Model",
        description="MoGe depth estimation model version",
        items=[("v2", "MoGe-V2", "Latest model with normal estimation"),
               ("v1", "MoGe-V1", "Original model")],
        default="v2")

    # detection knobs (reference properties.py:109-137)
    box_threshold: bpy.props.FloatProperty(
        name="Detection Threshold", default=0.4, min=0.0, max=1.0,
        description="Confidence threshold for object detection")
    min_area_ratio: bpy.props.FloatProperty(
        name="Min Area Ratio", default=0.003, min=0.0, max=1.0, precision=4)
    max_area_ratio: bpy.props.FloatProperty(
        name="Max Area Ratio", default=0.2, min=0.0, max=1.0, precision=4)
    resolution_level: bpy.props.IntProperty(
        name="Resolution Level", default=9, min=0, max=9,
        description="Depth estimation resolution")
    use_fp16: bpy.props.BoolProperty(
        name="Use FP16", default=True,
        description="Half precision for faster inference")
    output_name: bpy.props.StringProperty(
        name="Output Name", default="camera_object_0",
        description="Name prefix for exported trajectories/outputs")

    prompt: bpy.props.StringProperty(
        name="Prompt", default="a cinematic scene",
        description="Text description of the video to generate (the "
                    "reference's video_prompt; its generation_prompt twin "
                    "is defined but never consumed — merged here)")
    negative_prompt: bpy.props.StringProperty(name="Negative Prompt", default="")
    num_frames: bpy.props.IntProperty(name="Frames", default=81, min=1,
                                      max=241, update=_update_num_frames)
    fps: bpy.props.IntProperty(name="FPS", default=16, min=1, max=60)
    steps: bpy.props.IntProperty(name="Steps", default=30, min=1, max=200)
    guidance: bpy.props.FloatProperty(name="Guidance", default=5.0, min=0, max=20)
    seed: bpy.props.IntProperty(name="Seed", default=2025, min=0)
    height: bpy.props.IntProperty(name="Height", default=480, min=64)
    width: bpy.props.IntProperty(name="Width", default=832, min=64)
    # acceleration toggles (serving generate params, CLI parity)
    teacache_threshold: bpy.props.FloatProperty(
        name="TeaCache Threshold", default=0.0, min=0.0, max=1.0,
        description="0 disables TeaCache step skipping")
    cfg_skip_ratio: bpy.props.FloatProperty(
        name="CFG Skip Ratio", default=0.0, min=0.0, max=1.0)

    workdir: bpy.props.StringProperty(
        name="Local Folder", subtype="DIR_PATH", default="//versecrafter")
    point_size: bpy.props.FloatProperty(name="Point Size", default=0.004)
    ellipsoid_sigma: bpy.props.FloatProperty(
        name="Ellipsoid Sigma", default=2.0, min=0.5, max=5.0)

    # progress state (per-step completion flags, reference :173-186)
    status_text: bpy.props.StringProperty(default="")
    is_processing: bpy.props.BoolProperty(default=False)
    preprocess_done: bpy.props.BoolProperty(default=False)
    scene_loaded: bpy.props.BoolProperty(default=False)
    exported: bpy.props.BoolProperty(default=False)
    render_done: bpy.props.BoolProperty(default=False)
    generate_done: bpy.props.BoolProperty(default=False)
    generated_video: bpy.props.StringProperty(default="")
    # reference-granularity step flags (properties.py:173-179): 1 depth,
    # 2 segment, 3 gaussian fit (all three set by preprocess), 4 trajectory
    # export, 5 render, 6 generate. The coarse *_done flags above remain
    # the operators' primary state; these mirror them for the reference's
    # 6-step progress display
    step1_complete: bpy.props.BoolProperty(name="Step 1 Complete", default=False)
    step2_complete: bpy.props.BoolProperty(name="Step 2 Complete", default=False)
    step3_complete: bpy.props.BoolProperty(name="Step 3 Complete", default=False)
    step4_complete: bpy.props.BoolProperty(name="Step 4 Complete", default=False)
    step5_complete: bpy.props.BoolProperty(name="Step 5 Complete", default=False)
    step6_complete: bpy.props.BoolProperty(name="Step 6 Complete", default=False)


class VerseCrafterPreferences(bpy.types.AddonPreferences):
    """Addon preferences (reference properties.py:189-229): default server
    URL, server-side model paths, auto-save toggle."""

    bl_idname = __package__

    default_server_url: bpy.props.StringProperty(
        name="Default Server URL",
        description="Default API server URL",
        default="http://127.0.0.1:8190")
    model_path: bpy.props.StringProperty(
        name="VerseCrafter Model Path",
        description="Path to VerseCrafter model on server",
        default="model/VerseCrafter")
    base_model_path: bpy.props.StringProperty(
        name="Base Model Path",
        description="Path to Wan2.1 base model on server",
        default="model/Wan2.1-T2V-14B")
    auto_save_blend: bpy.props.BoolProperty(
        name="Auto-save .blend",
        description="Automatically save the .blend file before processing",
        default=True)

    def draw(self, context):
        layout = self.layout
        layout.label(text="Server Settings:")
        layout.prop(self, "default_server_url")
        layout.separator()
        layout.label(text="Model Paths (on Server):")
        layout.prop(self, "model_path")
        layout.prop(self, "base_model_path")
        layout.separator()
        layout.prop(self, "auto_save_blend")


def register():
    bpy.utils.register_class(VerseCrafterSettings)
    bpy.utils.register_class(VerseCrafterPreferences)
    bpy.types.Scene.versecrafter = bpy.props.PointerProperty(
        type=VerseCrafterSettings)


def unregister():
    del bpy.types.Scene.versecrafter
    bpy.utils.unregister_class(VerseCrafterPreferences)
    bpy.utils.unregister_class(VerseCrafterSettings)
