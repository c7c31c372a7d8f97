"""Video / image IO.

Host-side replacement for the reference's `videox_fun.utils.utils` IO surface
(`get_video_to_video_latent`, `get_image_latent`, `save_videos_grid` —
consumption sites /root/reference/inference/versecrafter_inference.py:351-416,
456): mp4 -> [B, C, T, H, W] float tensors resampled to a target fps and
frame count, image loading with resize/center-crop, and mp4 writing. Uses
OpenCV (no torchvision in this image). Arrays are numpy float32 in [0, 1];
device placement happens in the pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import cv2
import numpy as np


def _resize_center_crop(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Resize shorter side then center-crop to (H, W) — matches the
    reference's video processor semantics (aspect-preserving)."""
    th, tw = size
    h, w = img.shape[:2]
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR)
    top = (nh - th) // 2
    left = (nw - tw) // 2
    return img[top:top + th, left:left + tw]


def load_video(
    path: str,
    num_frames: Optional[int] = None,
    size: Optional[Tuple[int, int]] = None,
    fps: Optional[int] = None,
) -> np.ndarray:
    """mp4 -> [1, 3, T, H, W] float32 in [0, 1], RGB.

    If `fps` is given, frames are resampled from the source fps; the clip is
    then truncated/padded(edge) to `num_frames`."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")

    if fps is not None and abs(src_fps - fps) > 1e-3:
        idx = np.arange(0, len(frames), src_fps / fps).astype(int)
        idx = idx[idx < len(frames)]
        frames = [frames[i] for i in idx]

    if num_frames is not None:
        if len(frames) >= num_frames:
            frames = frames[:num_frames]
        else:
            frames = frames + [frames[-1]] * (num_frames - len(frames))

    if size is not None:
        frames = [_resize_center_crop(f, size) for f in frames]

    arr = np.stack(frames).astype(np.float32) / 255.0  # [T, H, W, 3]
    return arr.transpose(3, 0, 1, 2)[None]  # [1, 3, T, H, W]


def load_image(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """image -> [1, 3, 1, H, W] float32 in [0, 1], RGB."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if size is not None:
        img = _resize_center_crop(img, size)
    arr = img.astype(np.float32) / 255.0
    return arr.transpose(2, 0, 1)[None, :, None]


def save_video(video: np.ndarray, path: str, fps: int = 16) -> None:
    """[T, H, W, 3] or [1, 3, T, H, W] float in [0,1] -> mp4 (h264 via
    OpenCV's mp4v/avc fallback)."""
    if video.ndim == 5:
        video = video[0].transpose(1, 2, 3, 0)
    t, h, w, _ = video.shape
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    frames = (video if video.dtype == np.uint8
              else (np.clip(video, 0, 1) * 255).astype(np.uint8))
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"avc1"), fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def save_image(img: np.ndarray, path: str) -> None:
    """[H, W, 3] float in [0,1] -> png."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                                   cv2.COLOR_RGB2BGR))
