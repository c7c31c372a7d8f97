"""Text-prompted image segmentation interface.

Re-implements the surface of the reference's `ImageSegmenter`
(/root/reference/inference/grounded_sam2_infer.py:37-383: GroundingDINO
text-prompted boxes -> SAM2 box-prompted masks, top-K-by-area keep :159-169,
area-ratio filter :201-225, per-object mask files mask_{id:02d}_{label}.png
:352, combined mask + annotation txt) with pluggable detection/mask
backends:

- `backend="auto"`: JAX SAM2 + GroundingDINO ports when their weights are
  available (scheduled build-out; see perception/sam2.py once landed);
- `backend="saliency"`: a dependency-free classical fallback (color k-means
  + depth-assisted component analysis) that produces usable object masks for
  driving the downstream pipeline in offline environments. Quality is NOT
  SAM2-parity; it exists so every pipeline stage is runnable end-to-end.

The file-output contract is exact, so downstream stages (Gaussian fitting,
rendering, the Blender addon) cannot tell backends apart.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np


@dataclass
class Detection:
    label: str
    score: float
    box: Tuple[int, int, int, int]  # x0, y0, x1, y1
    mask: np.ndarray                # [H, W] bool


@dataclass
class ImageSegmenter:
    backend: str = "saliency"
    box_threshold: float = 0.25
    text_threshold: float = 0.25
    max_objects: int = 5
    min_area_ratio: float = 0.002
    max_area_ratio: float = 0.6
    # neural backend checkpoints (converted; perception/sam2.py, gdino.py)
    sam2_params: object = None
    gdino_params: object = None
    tokenizer: object = None

    def segment_image(self, image: np.ndarray, text_prompt: str,
                      depth: Optional[np.ndarray] = None) -> List[Detection]:
        """image [H,W,3] uint8 RGB; text_prompt 'car. person.' ->
        detections sorted by area (top-K kept, area-ratio filtered —
        grounded_sam2_infer.py:159-225 semantics)."""
        labels = [t.strip() for t in text_prompt.replace(",", ".").split(".")
                  if t.strip()]
        if self.backend == "saliency":
            dets = self._saliency_segment(image, labels, depth)
        elif self.backend == "neural":
            dets = self._neural_segment(image, labels)
        else:
            raise ValueError(f"unknown backend {self.backend!r}")

        h, w = image.shape[:2]
        area = h * w
        dets = [d for d in dets
                if self.min_area_ratio <= d.mask.sum() / area <= self.max_area_ratio]
        dets.sort(key=lambda d: d.mask.sum(), reverse=True)
        return dets[: self.max_objects]

    # -- classical fallback -------------------------------------------------
    def _saliency_segment(self, image, labels, depth) -> List[Detection]:
        h, w = image.shape[:2]
        # k-means over (color, position) features; treat compact non-border
        # clusters as objects
        feats = np.concatenate([
            cv2.GaussianBlur(image, (9, 9), 0).reshape(-1, 3).astype(np.float32) / 255.0,
            (np.mgrid[0:h, 0:w].transpose(1, 2, 0).reshape(-1, 2)
             / [h, w]).astype(np.float32) * 0.5,
        ], 1)
        if depth is not None:
            d = depth.astype(np.float32)
            if d.shape != (h, w):  # tolerate padded/differently-sized depth
                d = cv2.resize(d, (w, h), interpolation=cv2.INTER_LINEAR)
            d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
            feats = np.concatenate([feats, d.reshape(-1, 1)], 1)
        k = min(8, max(3, len(labels) + 2))
        _, lab, _ = cv2.kmeans(
            feats, k, None,
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0),
            3, cv2.KMEANS_PP_CENTERS)
        lab = lab.reshape(h, w)

        dets: List[Detection] = []
        for c in range(k):
            m = (lab == c).astype(np.uint8)
            # border-touching clusters are background
            border = m[0].mean() + m[-1].mean() + m[:, 0].mean() + m[:, -1].mean()
            if border > 0.5:
                continue
            n, comp, stats, _ = cv2.connectedComponentsWithStats(m)
            for i in range(1, n):
                x, y, bw, bh, a = stats[i]
                if a < self.min_area_ratio * h * w:
                    continue
                mask = comp == i
                label = labels[len(dets) % len(labels)] if labels else f"object"
                dets.append(Detection(label, 0.5, (x, y, x + bw, y + bh), mask))
        return dets

    # -- neural backend: GroundingDino boxes -> SAM masks --------------------
    def _neural_segment(self, image, labels) -> List[Detection]:
        """Text-prompted detection + box-prompted masks (the reference's
        GroundingDINO->SAM2 path, grounded_sam2_infer.py:143-194), using the
        parity-validated ports (perception/gdino_hf.py, perception/sam.py).
        Requires converted weights + a BERT tokenizer."""
        import cv2
        import jax
        import jax.numpy as jnp
        import numpy as np

        from versecrafter_tpu.perception import gdino_hf
        from versecrafter_tpu.perception import sam as sam_mod

        if self.sam2_params is None or self.gdino_params is None:
            raise RuntimeError("neural backend needs converted sam/gdino params")
        gparams, gcfg = self.gdino_params
        sparams, scfg = self.sam2_params

        h, w = image.shape[:2]
        size = 896  # divisible by 32 and by the Swin window tiling
        resized = cv2.resize(image, (size, size)).astype(np.float32) / 255.0
        resized = (resized - np.array([0.485, 0.456, 0.406])) \
            / np.array([0.229, 0.224, 0.225])

        if self.tokenizer is None:
            raise RuntimeError("neural backend needs a BERT tokenizer")
        enc = self.tokenizer(" ".join(f"{l}." for l in labels))
        ids = np.asarray(enc["input_ids"])[None] if np.ndim(enc["input_ids"]) == 1 \
            else np.asarray(enc["input_ids"])
        logits, boxes = gdino_hf.gdino_forward(
            gparams, gcfg,
            jnp.asarray(resized.transpose(2, 0, 1))[None].astype(jnp.float32), ids)
        score = np.asarray(jax.nn.sigmoid(logits).max(-1)[0])
        keep = np.where(score > self.box_threshold)[0]

        # SAM mask per kept box
        oh, ow = image.shape[:2]
        img_size = scfg["img_size"]
        sx = cv2.resize(image, (img_size, img_size)).astype(np.float32) / 255.0
        sx = (sx - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        emb = sam_mod.vision_forward(sparams, scfg,
                                     jnp.asarray(sx, jnp.float32)[None])
        dets: List[Detection] = []
        for qi in keep[: self.max_objects * 2]:
            cx, cy, bw, bh = np.asarray(boxes[0, qi])
            box = np.array([(cx - bw / 2) * ow, (cy - bh / 2) * oh,
                            (cx + bw / 2) * ow, (cy + bh / 2) * oh])
            sbox = box * np.array([img_size / ow, img_size / oh] * 2)
            sparse = sam_mod.encode_prompts(sparams, scfg,
                                            boxes=jnp.asarray(sbox)[None, None])
            masks, iou = sam_mod.decode_masks(sparams, scfg, emb, sparse)
            best = 1 + int(jnp.argmax(iou[0, 0, 1:]))
            m = cv2.resize(np.asarray(masks[0, 0, best], np.float32), (ow, oh))
            label = labels[len(dets) % len(labels)] if labels else "object"
            dets.append(Detection(label, float(score[qi]),
                                  tuple(box.astype(int)), m > 0))
        return dets

    # -- file contract -------------------------------------------------------
    def save_results(self, image: np.ndarray, detections: Sequence[Detection],
                     output_dir: str, stem: str = "") -> Dict[str, str]:
        """Writes masks/mask_{id:02d}_{label}.png, {stem}_mask_combined.png,
        {stem}_annotations.txt, {stem}_visualization.png (reference layout,
        grounded_sam2_infer.py:316-383)."""
        os.makedirs(os.path.join(output_dir, "masks"), exist_ok=True)
        paths = {}
        combined = np.zeros(image.shape[:2], np.uint8)
        vis = image.copy()
        lines = []
        for i, d in enumerate(detections, start=1):
            name = f"mask_{i:02d}_{d.label}.png"
            p = os.path.join(output_dir, "masks", name)
            cv2.imwrite(p, d.mask.astype(np.uint8) * 255)
            paths[name] = p
            combined |= d.mask.astype(np.uint8) * 255
            x0, y0, x1, y1 = d.box
            cv2.rectangle(vis, (x0, y0), (x1, y1), (255, 60, 60), 2)
            cv2.putText(vis, f"{i}:{d.label}", (x0, max(y0 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 60, 60), 1)
            lines.append(f"{i}\t{d.label}\t{d.score:.3f}\t{x0},{y0},{x1},{y1}\t"
                         f"{int(d.mask.sum())}")

        pre = f"{stem}_" if stem else ""
        cp = os.path.join(output_dir, f"{pre}mask_combined.png")
        cv2.imwrite(cp, combined)
        paths["combined"] = cp
        vp = os.path.join(output_dir, f"{pre}visualization.png")
        cv2.imwrite(vp, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        paths["visualization"] = vp
        ap = os.path.join(output_dir, f"{pre}annotations.txt")
        with open(ap, "w") as f:
            f.write("\n".join(lines) + "\n")
        paths["annotations"] = ap
        return paths
