"""CLI: fit per-object 3D Gaussians (step 3 of the pipeline).

Flag-compatible with /root/reference/inference/fit_3D_gaussian.py.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Fit 3D Gaussians from depth NPZ + segmentation masks")
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--masks_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--device", type=str, default="cpu")
    p.add_argument("--input_image_path", type=str, default=None)
    p.add_argument("--disable_visualization", action="store_true")
    args = p.parse_args(argv)

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()

    from versecrafter_tpu.geometry.gaussians import process_single_image

    out = process_single_image(args.npz_path, args.masks_dir, args.output_dir,
                               input_image_path=args.input_image_path)
    print(f"fitted {out['num_objects']} objects -> {args.output_dir}/gaussian_params.json")


if __name__ == "__main__":
    main()
