"""Video IO round-trip and profiling utilities."""

import numpy as np

from versecrafter_tpu.utils.profiling import StepTimer
from versecrafter_tpu.utils.video import (
    load_image, load_video, save_image, save_video)


def test_video_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vid = rng.random((7, 32, 48, 3)).astype(np.float32)
    p = str(tmp_path / "v.mp4")
    save_video(vid, p, fps=8)
    back = load_video(p)
    assert back.shape == (1, 3, 7, 32, 48)
    # lossy codec: coarse agreement
    diff = np.abs(back[0].transpose(1, 2, 3, 0) - vid).mean()
    assert diff < 0.2


def test_video_resample_and_pad(tmp_path):
    vid = np.zeros((10, 16, 16, 3), np.float32)
    p = str(tmp_path / "v.mp4")
    save_video(vid, p, fps=10)
    out = load_video(p, num_frames=7, size=(32, 32), fps=5)
    assert out.shape == (1, 3, 7, 32, 32)  # resampled 10->5fps then padded
    out2 = load_video(p, num_frames=4)
    assert out2.shape[2] == 4  # truncated


def test_image_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((24, 36, 3)).astype(np.float32)
    p = str(tmp_path / "i.png")
    save_image(img, p)
    back = load_image(p)
    assert back.shape == (1, 3, 1, 24, 36)
    np.testing.assert_allclose(back[0, :, 0].transpose(1, 2, 0), img, atol=0.01)
    cropped = load_image(p, size=(12, 12))
    assert cropped.shape == (1, 3, 1, 12, 12)


def test_step_timer():
    import time

    t = StepTimer()
    for i in range(4):
        t.tick(i, 4)
        time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 9.0


def test_missing_leading_control_stream_zero_filled(tmp_path):
    """A missing control mp4 becomes zeros IN ITS SLOT — including a
    missing LEADING stream (the demo clips ship without background_RGB.mp4;
    reference versecrafter_inference.py:377-382 drops that slot and the
    misaligned 3-stream stack crashes at the GeoAdapter patch embed)."""
    from versecrafter_tpu.serve.model_server import load_request_inputs

    rng = np.random.default_rng(0)
    t, h, w = 5, 8, 8
    for name in ["background_depth", "3D_gaussian_RGB", "3D_gaussian_depth",
                 "merged_mask"]:  # background_RGB deliberately absent
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(tmp_path / f"{name}.mp4"), fps=5)
    controls, mask = load_request_inputs({
        "rendering_maps_path": str(tmp_path),
        "height": h, "width": w, "num_frames": t})
    assert len(controls) == 4
    assert all(c.shape == (1, 3, t, h, w) for c in controls)
    assert np.abs(controls[0]).max() == 0.0  # zero-filled slot 0
    assert np.abs(controls[1]).max() > 0.0   # loaded stream kept its slot
    assert mask.shape == (1, 1, t, h, w)
