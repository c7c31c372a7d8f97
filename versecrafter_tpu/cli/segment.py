"""CLI: text-prompted segmentation (step 2 of the pipeline).

Surface-compatible with /root/reference/inference/grounded_sam2_infer.py's
CLI (image + text prompt -> per-object masks, combined mask, annotations).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Text-prompted segmentation")
    p.add_argument("--image", "-i", required=True)
    p.add_argument("--text", "-t", required=True,
                   help="e.g. 'car. person.'")
    p.add_argument("--output", "-o", default="./output")
    p.add_argument("--depth_npz", default=None,
                   help="optional depth to assist the fallback backend")
    p.add_argument("--backend", default="saliency")
    p.add_argument("--box_threshold", type=float, default=0.25)
    p.add_argument("--text_threshold", type=float, default=0.25)
    p.add_argument("--max_objects", type=int, default=5)
    # neural backend (GDINO -> SAM2, grounded_sam2_infer.py parity)
    p.add_argument("--sam2_checkpoint", default=None,
                   help="HF Sam2Model (or SamModel for --mask_backend sam1) "
                        "torch state dict")
    p.add_argument("--gdino_checkpoint", default=None,
                   help="HF GroundingDinoForObjectDetection torch state dict")
    p.add_argument("--bert_vocab", default=None,
                   help="BERT vocab.txt for the GDINO text tower")
    p.add_argument("--mask_backend", default="sam2", choices=["sam2", "sam1"])
    p.add_argument("--neural_fresh_init", action="store_true",
                   help="random real-scale weights (smoke/bench; no "
                        "checkpoints ship in this environment)")
    p.add_argument("--gdino_bf16", action="store_true",
                   help="run the GDINO detector in bf16 (faster on TPU; "
                        "locations/softmax/box recursion stay fp32)")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()

    from versecrafter_tpu.perception.segmenter import ImageSegmenter

    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    depth = None
    if args.depth_npz:
        d = np.load(args.depth_npz)["depth"].astype(np.float32)
        depth = d[0] if d.ndim == 3 else d

    kw = dict(box_threshold=args.box_threshold,
              text_threshold=args.text_threshold,
              max_objects=args.max_objects)
    if args.backend == "neural":
        seg = ImageSegmenter.build_neural(
            sam2_checkpoint=args.sam2_checkpoint,
            gdino_checkpoint=args.gdino_checkpoint,
            bert_vocab=args.bert_vocab, mask_backend=args.mask_backend,
            fresh_init=args.neural_fresh_init,
            gdino_bf16=args.gdino_bf16, **kw)
    else:
        seg = ImageSegmenter(backend=args.backend, **kw)
    dets = seg.segment_image(img, args.text, depth=depth)
    paths = seg.save_results(img, dets, args.output)
    print(f"segmented {len(dets)} objects -> {args.output}")


if __name__ == "__main__":
    main()
