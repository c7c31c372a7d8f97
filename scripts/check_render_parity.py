"""Full-trajectory (all 81 frames) render parity vs the reference goldens.

The pytest goldens subsample 9 frames for CI speed; this script renders every
frame of both demo clips and prints per-stream mean/min PSNR (IoU for masks)
— the full-coverage check for the TPU verify recipe (reference mp4s are
crf18-compressed, which sets the PSNR ceiling around 37-42 dB).

Usage: python scripts/check_render_parity.py            (CPU is fine)
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_render_parity.py
"""

import json
import sys
from pathlib import Path

import cv2
import numpy as np

CLIPS = [
    "/root/reference/demo_data/dc58debb-191d-50cb-8ba1-a5afdeec1808_0000091_0000172",
    "/root/reference/demo_data/LXKcD2zSPMc_0351466_0353266_0001469_0001550",
]
STREAMS = ("background_RGB", "background_depth", "merged_mask",
           "3D_gaussian_RGB", "3D_gaussian_depth")


def read_all_frames(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def main():
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from versecrafter_tpu.geometry.pointcloud import load_background_from_files
    from versecrafter_tpu.geometry.render import (
        load_camera_trajectory, load_gaussian_trajectory, render_control_maps)

    fails = []
    for clip in CLIPS:
        clip = Path(clip)
        if not clip.exists():
            print(json.dumps({"clip": clip.name, "skip": "not mounted"}))
            continue
        pts, cols, K, h, w = load_background_from_files(
            str(clip / "0001.png"),
            str(clip / "estimated_depth/depth_intrinsics.npz"),
            str(clip / "object_mask/masks"))
        w2cs = load_camera_trajectory(
            str(clip / "camera_object_0/custom_camera_trajectory.npz"))
        means, covs, present, ocolors, _ = load_gaussian_trajectory(
            str(clip / "camera_object_0/custom_3D_gaussian_trajectory.json"))
        n = len(w2cs)
        vids = render_control_maps(pts, cols, K, w2cs, means[:n], covs[:n],
                                   present[:n], ocolors, (h, w))
        for stream in STREAMS:
            p = clip / f"camera_object_0/rendering_4D_maps/{stream}.mp4"
            if not p.exists():
                print(json.dumps({"clip": clip.name[:12], "stream": stream,
                                  "skip": "golden not shipped"}))
                continue
            ref = read_all_frames(p)
            m = min(len(ref), n)
            if stream == "merged_mask":
                vals = []
                for i in range(m):
                    got = vids[stream][i][..., 0] > 127
                    want = ref[i][..., 0] > 127
                    vals.append((got & want).sum() / max((got | want).sum(), 1))
                ok = bool(min(vals) > 0.985)
                rec = {"clip": clip.name[:12], "stream": stream, "frames": m,
                       "iou_mean": round(float(np.mean(vals)), 4),
                       "iou_min": round(float(np.min(vals)), 4), "ok": ok}
            else:
                vals = [psnr(vids[stream][i], ref[i]) for i in range(m)]
                floor = 25.0 if "RGB" in stream else 28.0
                ok = bool(min(vals) > floor)
                rec = {"clip": clip.name[:12], "stream": stream, "frames": m,
                       "psnr_mean": round(float(np.mean(vals)), 2),
                       "psnr_min": round(float(np.min(vals)), 2), "ok": ok}
            if not ok:
                fails.append(rec)
            print(json.dumps(rec))
    print(json.dumps({"result": "FAIL" if fails else "OK",
                      "failed": len(fails)}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
