"""Smoke test for the single-process pipeline driver (cli/pipeline.py).

The individual stage CLIs are covered by their own suites (perception,
geometry, serving) and the full 6-stage run is exercised on the real chip
by pipeline.sh; here we check the DRIVER's wiring — stage sequencing,
--skip, flag passthrough (sample_size / steps / video_length /
smoke_scale) — with the heavy stages skipped and a tiny offline-smoke
generate over synthetic control maps.
"""

import os

import numpy as np
import pytest


def test_driver_generate_stage(tmp_path, capsys):
    from versecrafter_tpu.cli import pipeline
    from versecrafter_tpu.utils.video import save_video

    data = tmp_path / "data"
    out = tmp_path / "out"
    data.mkdir()
    (out / "rendering_4D_maps").mkdir(parents=True)

    rng = np.random.default_rng(0)
    t, h, w = 5, 16, 16
    # input image (first control frame is overwritten with it)
    from versecrafter_tpu.utils.video import save_image
    save_image(rng.random((h, w, 3)).astype(np.float32),
               str(data / "0001.png"))
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(out / "rendering_4D_maps" / f"{name}.mp4"), fps=5)

    pipeline.main([
        "--data", str(data), "--out", str(out),
        "--skip", "depth,segment,gaussian,render",
        "--smoke_scale", "tiny", "--sample_size", f"{h},{w}",
        "--num_inference_steps", "2", "--video_length", str(t),
        "--prompt", "smoke",
    ])

    gen = out / "generated"
    vids = [f for f in os.listdir(gen) if f.endswith(".mp4")]
    assert vids, f"no video written in {gen}"
    txt = capsys.readouterr().out
    assert "stage_wall_s" in txt and "generate" in txt


def test_driver_skip_all(tmp_path, capsys):
    from versecrafter_tpu.cli import pipeline

    pipeline.main([
        "--data", str(tmp_path), "--out", str(tmp_path / "o"),
        "--skip", "depth,segment,gaussian,render,generate"])
    txt = capsys.readouterr().out
    assert txt.count("skipped") == 5
