"""Sidebar UI (3-step workflow panel + settings), mirroring the reference's
panel layout (/root/reference/blender_addon/panels.py:17-84)."""

import bpy


class VERSECRAFTER_PT_main(bpy.types.Panel):
    bl_label = "VerseCrafter"
    bl_space_type = "VIEW_3D"
    bl_region_type = "UI"
    bl_category = "VerseCrafter"

    def draw(self, context):
        s = context.scene.versecrafter
        col = self.layout.column()

        box = col.box()
        box.label(text="Server")
        box.prop(s, "server_url")
        box.prop(s, "proxy_cookie")
        box.operator("versecrafter.test_connection")

        box = col.box()
        box.label(text="Step 1 — Preprocess")
        box.prop(s, "image_path")
        box.prop(s, "workdir")
        box.prop(s, "text_prompt")
        box.prop(s, "depth_model_version")
        row = box.row()
        row.prop(s, "resolution_level")
        row.prop(s, "use_fp16")
        box.prop(s, "box_threshold")
        row = box.row()
        row.prop(s, "min_area_ratio")
        row.prop(s, "max_area_ratio")
        box.operator("versecrafter.preprocess",
                     icon="CHECKMARK" if s.preprocess_done else "NONE")

        box = col.box()
        box.label(text="Step 2 — Author Trajectories")
        box.operator("versecrafter.load_scene",
                     icon="CHECKMARK" if s.scene_loaded else "NONE")
        box.prop(s, "output_name")
        box.prop(s, "ellipsoid_sigma")
        box.operator("versecrafter.export_trajectories",
                     icon="CHECKMARK" if s.exported else "NONE")

        box = col.box()
        box.label(text="Step 3 — Generate")
        box.prop(s, "prompt")
        box.prop(s, "steps")
        box.prop(s, "guidance")
        row = box.row()
        row.prop(s, "height")
        row.prop(s, "width")
        row = box.row()
        row.prop(s, "num_frames")
        row.prop(s, "fps")
        box.prop(s, "seed")
        box.prop(s, "teacache_threshold")
        box.prop(s, "cfg_skip_ratio")
        box.operator(
            "versecrafter.postprocess",
            icon="CHECKMARK" if s.generate_done else "NONE")
        box.operator("versecrafter.open_folder")

        # per-step completion summary at the reference's 6-step granularity
        # (step1..6_complete, reference panels.py:33-70: depth / segment /
        # gaussian fit / trajectories / render / generate)
        done = [s.step1_complete, s.step2_complete, s.step3_complete,
                s.step4_complete, s.step5_complete, s.step6_complete]
        col.label(text=f"Progress: {sum(done)}/6  " + " ".join(
            ("[x]" if d else "[ ]") for d in done))
        if s.is_processing:
            col.label(text="processing...", icon="TIME")
        if s.status_text:
            col.label(text=s.status_text)


def register():
    bpy.utils.register_class(VERSECRAFTER_PT_main)


def unregister():
    bpy.utils.unregister_class(VERSECRAFTER_PT_main)
