"""CLI: render 4D control maps (step 5 of the pipeline).

Flag-compatible with /root/reference/inference/rendering_4D_control_maps.py
(parse_args at :1146-1168) so the reference's inference.sh invocations work
unchanged against this framework.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Render 4D control maps from pre-computed parameters (TPU)")
    p.add_argument("--png_path", type=str, required=False)
    p.add_argument("--video_path", type=str, required=False)
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--mask_dir", type=str, required=False)
    p.add_argument("--mask_video", type=str, required=False)
    p.add_argument("--trajectory_npz", type=str, required=True)
    p.add_argument("--ellipsoid_json", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="outputs/inference")
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--point_size", type=float, default=0.005)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--render_batch_size", type=int, default=27)
    p.add_argument("--use_fp16", action="store_true")
    p.add_argument("--pin_memory", action="store_true")
    p.add_argument("--ellipsoid_subdiv", type=int, default=3)
    p.add_argument("--trajectory_radius", type=float, default=0.03)
    p.add_argument("--gaussian_mask_threshold", type=float, default=0.003)
    p.add_argument("--sample_frames", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from versecrafter_tpu.geometry.render import render_from_files

    def progress(i, n):
        # the serving layer parses "i / n" progress lines
        # (api_server progress regex contract)
        print(f"Rendering {i} / {n}", flush=True)

    paths = render_from_files(
        png_path=args.png_path,
        npz_path=args.npz_path,
        mask_dir=args.mask_dir,
        trajectory_npz=args.trajectory_npz,
        ellipsoid_json=args.ellipsoid_json,
        output_dir=args.output_dir,
        point_size=args.point_size,
        fps=args.fps,
        frame_batch=args.render_batch_size,
        progress=progress,
    )
    for name, path in paths.items():
        print(f"saved {name}: {path}")


if __name__ == "__main__":
    main()
