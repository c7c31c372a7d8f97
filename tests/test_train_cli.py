"""Training driver CLI: synthetic smoke on single device and on the mesh."""

import os

import numpy as np
import pytest

from versecrafter_tpu.cli import train as train_cli


def test_train_synthetic_single_device(tmp_path):
    losses = train_cli.main([
        "--tiny", "--synthetic", "4", "--steps", "6", "--batch_size", "2",
        "--sample_size", "64,64", "--video_length", "9",
        "--log_every", "2", "--save_every", "6",
        "--output_dir", str(tmp_path), "--attn_impl", "xla"])
    assert len(losses) == 6
    assert all(np.isfinite(l) for l in losses)
    # GeoAdapter-only training must make progress on the synthetic objective
    assert losses[-1] < losses[0] * 1.5  # not diverging
    assert os.path.isdir(os.path.join(str(tmp_path), "step_000006"))


def test_train_synthetic_mesh(tmp_path):
    """dp2 x sp2 x tp2 over the 8-device CPU test mesh."""
    losses = train_cli.main([
        "--tiny", "--synthetic", "4", "--steps", "3", "--batch_size", "2",
        "--sample_size", "64,64", "--video_length", "9",
        "--dp", "2", "--sp", "2", "--tp", "2",
        "--log_every", "1", "--save_every", "3",
        "--output_dir", str(tmp_path)])
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
    assert os.path.isdir(os.path.join(str(tmp_path), "step_000003"))


def test_train_data_dir_requires_model(tmp_path):
    with pytest.raises(SystemExit):
        train_cli.main(["--tiny", "--data_dir", str(tmp_path), "--steps", "1"])


def test_train_lora_mesh(tmp_path):
    """LoRA finetuning composes with the sharded mesh: the low-rank
    factors (replicated — tiny) train against an sp-sharded forward, and
    the reference-format safetensors export lands."""
    losses = train_cli.main([
        "--tiny", "--synthetic", "4", "--steps", "3", "--batch_size", "2",
        "--sample_size", "64,64", "--video_length", "9",
        "--lora_rank", "4", "--sp", "4", "--dp", "2",
        "--log_every", "1", "--save_every", "3",
        "--output_dir", str(tmp_path)])
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "step_000003_lora.safetensors"))
