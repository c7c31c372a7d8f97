"""Text-prompted image segmentation interface.

Re-implements the surface of the reference's `ImageSegmenter`
(/root/reference/inference/grounded_sam2_infer.py:37-383: GroundingDINO
text-prompted boxes -> SAM2 box-prompted masks, top-K-by-area keep :159-169,
area-ratio filter :201-225, per-object mask files mask_{id:02d}_{label}.png
:352, combined mask + annotation txt) with pluggable detection/mask
backends:

- `backend="neural"`: the HF-parity-validated GroundingDino port
  (perception/gdino_hf.py) for text-prompted boxes -> the HF-parity-validated
  SAM2 Hiera port (perception/sam2.py) for box-prompted masks — the same
  model families the reference uses. Labels are phrase-grounded from the
  per-token logits (text_threshold honored), resizing preserves aspect
  ratio with padding, and class-agnostic NMS removes duplicates;
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
    # neural backend checkpoints (converted; perception/sam2.py, sam.py,
    # gdino_hf.py). sam2_params holds (params, cfg) of the selected
    # mask_backend family: "sam2" (Hiera — the reference's model) or "sam1"
    # (SAM-vit checkpoints; same predict_boxes contract).
    mask_backend: str = "sam2"
    sam2_params: object = None
    gdino_params: object = None
    tokenizer: object = None
    # detector letterbox size (multiple of 32 x the Swin window tiling)
    det_size: int = 896
    nms_iou: float = 0.5

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

    # -- neural backend construction -----------------------------------------
    @classmethod
    def build_neural(cls, sam2_checkpoint: Optional[str] = None,
                     gdino_checkpoint: Optional[str] = None,
                     bert_vocab: Optional[str] = None,
                     mask_backend: str = "sam2",
                     fresh_init: bool = False,
                     gdino_bf16: bool = False, **kwargs) -> "ImageSegmenter":
        """Build the neural (GDINO->SAM2) segmenter from torch checkpoints
        (HuggingFace GroundingDinoForObjectDetection / Sam2Model / SamModel
        state-dict layouts — what grounded_sam2_infer.py:104-143 loads), or
        with `fresh_init=True` random real-scale weights (Swin-T 896² +
        Hiera-L 1024²) for smoke/bench runs — no weights ship in this
        environment, so the fresh path builds THROUGH the HF model and the
        converter, keeping the conversion exercised.

        Tokenizer resolution: `bert_vocab` (a vocab.txt) > the locally
        cached bert-base-uncased > (fresh_init only) a minimal smoke vocab
        where unknown prompt words map to [UNK]."""
        if mask_backend not in ("sam2", "sam1"):
            raise ValueError(f"unknown mask_backend {mask_backend!r}")
        if mask_backend == "sam1" and not sam2_checkpoint:
            raise RuntimeError("mask_backend='sam1' needs a checkpoint "
                               "(no fresh-init shape for SAM1)")
        if not (gdino_checkpoint or fresh_init):
            raise RuntimeError(
                "neural backend needs --gdino_checkpoint (or fresh_init)")

        import torch
        import transformers

        from versecrafter_tpu.perception import gdino_hf, sam2 as sam2_mod

        def load_sd(path):
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return sd["model"] if "model" in sd and not hasattr(
                sd["model"], "shape") else sd

        import jax.numpy as _jnp
        gdtype = _jnp.bfloat16 if gdino_bf16 else _jnp.float32
        gcfg = dict(gdino_hf.SWINT_CFG)
        if gdino_checkpoint:
            gparams = gdino_hf.convert_hf_gdino(load_sd(gdino_checkpoint),
                                                gcfg, dtype=gdtype)
        elif fresh_init:
            hf = transformers.GroundingDinoForObjectDetection(
                gdino_hf.hf_swint_config()).eval()
            gparams = gdino_hf.convert_hf_gdino(hf.state_dict(), gcfg,
                                                dtype=gdtype)
            del hf
        else:
            raise RuntimeError(
                "neural backend needs --gdino_checkpoint (or fresh_init)")

        if mask_backend == "sam2":
            scfg = dict(sam2_mod.HIERA_LARGE)
            if sam2_checkpoint:
                sparams = sam2_mod.convert_hf_sam2(load_sd(sam2_checkpoint),
                                                   scfg)
            elif fresh_init:
                import jax
                import jax.numpy as jnp
                sparams = jax.jit(
                    lambda k: sam2_mod.init_sam2(k, scfg, jnp.float32)
                )(jax.random.key(0))
            else:
                raise RuntimeError(
                    "neural backend needs --sam2_checkpoint (or fresh_init)")
        elif mask_backend == "sam1":
            from versecrafter_tpu.perception import sam as sam1_mod
            if not sam2_checkpoint:
                raise RuntimeError("mask_backend='sam1' needs a checkpoint "
                                   "(no fresh-init shape for SAM1)")
            scfg = dict(sam1_mod.VIT_H, img_size=1024)
            sparams = sam1_mod.convert_hf_sam(load_sd(sam2_checkpoint), scfg)
        else:
            raise ValueError(f"unknown mask_backend {mask_backend!r}")

        if bert_vocab:
            tokenizer = transformers.BertTokenizer(bert_vocab)
        else:
            try:
                tokenizer = transformers.BertTokenizer.from_pretrained(
                    "bert-base-uncased", local_files_only=True)
            except Exception:
                if not fresh_init:
                    raise RuntimeError(
                        "neural backend needs --bert_vocab (no cached "
                        "bert-base-uncased in this environment)")
                import tempfile
                vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "."] \
                    + ["car", "person", "cat", "dog", "chair", "table",
                       "tree", "building", "object", "ball", "cup", "box"]
                f = tempfile.NamedTemporaryFile(
                    "w", suffix=".txt", delete=False)
                f.write("\n".join(vocab))
                f.close()
                tokenizer = transformers.BertTokenizer(f.name)

        return cls(backend="neural", mask_backend=mask_backend,
                   sam2_params=(sparams, scfg), gdino_params=(gparams, gcfg),
                   tokenizer=tokenizer, **kwargs)

    # -- neural backend: GroundingDino boxes -> SAM2 masks -------------------
    @staticmethod
    def _letterbox(image, size):
        """Aspect-preserving resize (longest side -> size) with bottom/right
        zero padding. Returns (padded float image 0..1, content_h, content_w)."""
        import cv2
        h, w = image.shape[:2]
        scale = size / max(h, w)
        ch, cw = max(1, round(h * scale)), max(1, round(w * scale))
        resized = cv2.resize(image, (cw, ch)).astype(np.float32) / 255.0
        out = np.zeros((size, size, 3), np.float32)
        out[:ch, :cw] = resized
        return out, ch, cw

    def _neural_segment(self, image, labels) -> List[Detection]:
        """Text-prompted detection + box-prompted masks (the reference's
        GroundingDINO->SAM2 path, grounded_sam2_infer.py:143-194), using the
        parity-validated ports (perception/gdino_hf.py, perception/sam2.py).
        Labels are grounded per phrase from the token posmap — the reference
        semantics of get_phrases_from_posmap — not round-robin. Requires
        converted weights + a BERT tokenizer."""
        import jax.numpy as jnp

        from versecrafter_tpu.perception import gdino_hf

        if self.mask_backend == "sam2":
            from versecrafter_tpu.perception import sam2 as sam2_mod
            size_key = "image_size"
        elif self.mask_backend == "sam1":
            from versecrafter_tpu.perception import sam as sam2_mod
            size_key = "img_size"
        else:
            raise ValueError(f"unknown mask_backend {self.mask_backend!r}")

        if self.sam2_params is None or self.gdino_params is None:
            raise RuntimeError("neural backend needs converted sam2/gdino params")
        if self.tokenizer is None:
            raise RuntimeError("neural backend needs a BERT tokenizer")
        gparams, gcfg = self.gdino_params
        sparams, scfg = self.sam2_params

        oh, ow = image.shape[:2]
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])

        size = self.det_size
        gimg, ch, cw = self._letterbox(image, size)
        gimg = (gimg - mean) / std

        ids, spans = gdino_hf.phrase_token_spans(self.tokenizer, labels)
        # jitted: eager per-op execution is one remote dispatch per op on
        # the axon backend (8.3 s/image at Swin-T 896² before jitting)
        logits, boxes = gdino_hf.gdino_forward_jit(
            gparams, gcfg,
            jnp.asarray(gimg.transpose(2, 0, 1))[None].astype(jnp.float32), ids)
        found = gdino_hf.postprocess_grounded_detections(
            logits, boxes, ids, self.box_threshold, self.text_threshold)
        if not found:
            return []
        # normalized (padded frame) -> original pixel coords, then NMS
        sx, sy = size / (cw / ow), size / (ch / oh)
        pix_boxes = np.stack([d["box"] * [sx, sy, sx, sy] for d in found])
        pix_boxes = np.clip(pix_boxes, 0, [ow, oh, ow, oh])
        keep = gdino_hf.nms_xyxy(pix_boxes,
                                 np.array([d["score"] for d in found]),
                                 iou_threshold=self.nms_iou)
        keep = keep[: self.max_objects * 2]
        found = [found[i] for i in keep]
        pix_boxes = pix_boxes[keep]

        # SAM masks, all kept boxes in one prompt batch — PADDED to the
        # static max (max_objects*2): a data-dependent prompt count would
        # recompile the Hiera forward (~90 s on chip) for every new
        # detection count; padded dummy prompts cost one decoder row each
        # and are sliced off below.
        s_size = scfg[size_key]
        simg, sch, scw = self._letterbox(image, s_size)
        simg = (simg - mean) / std
        sboxes = pix_boxes * np.array([scw / ow, sch / oh] * 2)
        n_found = len(found)
        pad_to = self.max_objects * 2
        if n_found < pad_to:
            dummy = np.tile([[0.0, 0.0, 8.0, 8.0]], (pad_to - n_found, 1))
            sboxes = np.concatenate([sboxes, dummy], 0)
        masks, iou, _ = sam2_mod.predict_boxes_jit(
            sparams, scfg, jnp.asarray(simg, jnp.float32)[None],
            jnp.asarray(sboxes, jnp.float32)[None], multimask_output=True)
        best = np.asarray(jnp.argmax(iou[0], axis=-1))  # [Q]

        import cv2
        dets: List[Detection] = []
        mh, mw = masks.shape[-2:]
        vh, vw = round(sch / s_size * mh), round(scw / s_size * mw)
        for qi, det in enumerate(found):
            m = np.asarray(masks[0, qi, best[qi]], np.float32)
            m = cv2.resize(m[:vh, :vw], (ow, oh))  # content region only
            label = labels[gdino_hf.assign_phrase(det, spans)] \
                if labels else "object"
            dets.append(Detection(label, det["score"],
                                  tuple(pix_boxes[qi].astype(int)), m > 0))
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
