"""Tests for the data-acquisition normalization passes (img_download
notebook parity, offline parts) and the evaluation CLI."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from video_cycle_gan_upscaling_tpu.data import acquire


def _img(w, h, color=(200, 30, 40)):
    return Image.new("RGB", (w, h), color)


def test_normalize_scale_to_cover_landscape():
    out = acquire.normalize_to_cover(_img(4000, 2000), target=(1920, 1080))
    assert out.size == (1920, 1080)


def test_normalize_rotates_portrait():
    out = acquire.normalize_to_cover(_img(2000, 4000), target=(1920, 1080))
    assert out.size == (1920, 1080)  # rotated to landscape first


def test_normalize_skips_too_small():
    assert acquire.normalize_to_cover(_img(640, 480), target=(1920, 1080)) is None


def test_normalize_exact_size_passthrough():
    out = acquire.normalize_to_cover(_img(1920, 1080))
    assert out.size == (1920, 1080)


def test_make_lowres():
    assert acquire.make_lowres(_img(1920, 1080)).size == (480, 270)


def test_normalize_directory(tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    _img(2000, 1500).save(src / "a.jpg")
    _img(100, 100).save(src / "b.jpg")  # skipped: too small
    n = acquire.normalize_directory(str(src), str(tmp_path / "hd"),
                                    target=(192, 108))
    # 100x100 is below (192,108) min -> only one converted
    assert n == 1
    out = Image.open(tmp_path / "hd" / "a.jpg")
    assert out.size == (192, 108)


def test_lowres_directory(tmp_path):
    src = tmp_path / "hd"
    src.mkdir()
    _img(1920, 1080).save(src / "a.jpg")
    n = acquire.lowres_directory(str(src), str(tmp_path / "lr"), target=(48, 27))
    assert n == 1
    assert Image.open(tmp_path / "lr" / "a.jpg").size == (48, 27)


def test_network_functions_gated_or_available():
    # requests may exist in the image; the functions must either work or
    # raise the documented gating error — never ImportError leakage
    try:
        acquire.index_unsplash(access_key=None)
        raised = False
    except RuntimeError:
        raised = True
    assert raised  # no key and/or no network


def test_evaluate_cli(tmp_path):
    # train a tiny model via the CLI, then evaluate it
    from video_cycle_gan_upscaling_tpu.cli import evaluate as cli_eval
    from video_cycle_gan_upscaling_tpu.cli import train_mini as cli_mini

    rng = np.random.default_rng(0)
    d = tmp_path / "images" / "set"
    d.mkdir(parents=True)
    for i in range(4):
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"im_{i}.jpg", quality=95)

    out = tmp_path / "run"
    cli_mini.main([
        "--images-root", str(tmp_path / "images"), "--output-root", str(out),
        "-i", "set", "-cl", "mse", "-nb", "3", "-msf", "2", "-ic", "4",
        "--res-blocks", "1", "--filters", "8", "-ks", "3",
        "--dtype", "float32", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.75", "-m", "orig"])

    lossdir = out / "losses" / "ukiyo" / "mini_orig_mse_x4"
    eval_out = tmp_path / "eval"
    summary = cli_eval.main([
        "-r", str(lossdir), "-i", str(d), "-o", str(eval_out),
        "-ic", "2", "--tile-height", "8", "--tile-width", "8",
        "--overlap", "2"])
    files = os.listdir(eval_out)
    assert "metrics.tsv" in files and "summary.json" in files
    assert any(f.endswith("_orig.jpg") for f in files)
    assert any("upscaled" in f for f in files)
    assert np.isfinite(summary["lowres_psnr"])
    # bicubic baseline recorded too
    assert np.isfinite(summary["lowres_bicubic_psnr"])
