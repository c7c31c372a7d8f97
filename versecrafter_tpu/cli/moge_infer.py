"""CLI: monocular depth + intrinsics (step 1 of the pipeline).

Flag-compatible with /root/reference/inference/moge-v2_infer.py; writes
depth_intrinsics.npz (fp16 depth + normalized intrinsics) and viz pngs.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Monocular geometry inference (TPU)")
    p.add_argument("--input", "-i", dest="input_path", required=True)
    p.add_argument("--fov_x", dest="fov_x", type=float, default=None)
    p.add_argument("--output", "-o", dest="output_path", default="./output")
    p.add_argument("--pretrained", dest="pretrained", default=None,
                   help="Path to a converted MoGe checkpoint (npz); random "
                        "init when absent (offline environments)")
    p.add_argument("--version", dest="model_version", default="v2")
    p.add_argument("--device", dest="device_name", default="tpu")
    p.add_argument("--fp16", dest="use_fp16", action="store_true")
    p.add_argument("--resize_to", type=int, default=None)
    p.add_argument("--resolution_level", type=int, default=9)
    p.add_argument("--num_tokens", type=int, default=None)
    p.add_argument("--threshold", type=float, default=0.04)
    p.add_argument("--maps", dest="save_maps", action="store_true")
    p.add_argument("--glb", dest="save_glb", action="store_true")
    p.add_argument("--ply", dest="save_ply", action="store_true")
    p.add_argument("--show", action="store_true")
    args = p.parse_args(argv)

    import cv2
    import jax
    import numpy as np

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()

    from versecrafter_tpu.perception import moge

    raw = cv2.imread(args.input_path)
    if raw is None:  # clear error like moge-v2_infer.py:117-119
        raise FileNotFoundError(f"File {args.input_path} does not exist "
                                "or is not a readable image.")
    img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
    if args.resize_to:
        h, w = img.shape[:2]
        nh = min(args.resize_to, int(args.resize_to * h / w))
        nw = min(args.resize_to, int(args.resize_to * w / h))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    oh, ow = img.shape[:2]
    # pad to patch multiple for the ViT; outputs crop back to (oh, ow)
    ph = -img.shape[0] % 14
    pw = -img.shape[1] % 14
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")

    params = moge.load_checkpoint(args.pretrained) if args.pretrained else \
        moge.init_moge(jax.random.key(0))
    out = moge.infer(params, img.astype(np.float32) / 255.0, fov_x=args.fov_x)
    out["depth"] = out["depth"][:oh, :ow]
    out["points"] = out["points"][:oh, :ow]
    out["mask"] = out["mask"][:oh, :ow]

    # no format flag -> save everything (moge-v2_infer.py:70-72)
    save_maps, save_glb, save_ply = args.save_maps, args.save_glb, args.save_ply
    if not (save_maps or save_glb or save_ply):
        save_maps = save_glb = save_ply = True
    if save_maps:
        npz = moge.save_outputs(out, args.output_path)
        print(f"saved {npz}")
    if save_glb or save_ply:
        paths = moge.export_mesh(out, img[:oh, :ow], args.output_path,
                                 threshold=args.threshold,
                                 save_glb=save_glb, save_ply=save_ply)
        for k, p in paths.items():
            print(f"saved {k}: {p}")


if __name__ == "__main__":
    main()
