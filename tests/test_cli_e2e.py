"""End-to-end CLI smoke tests: tiny synthetic datasets through the real
trainer entry points — data load, config persistence, fused steps,
logging, checkpoints, sample dumps, then inference over the checkpoint.
The jitted analog of actually running the reference scripts."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from video_cycle_gan_upscaling_tpu.cli import (
    train as cli_train,
    train_cgc_mini as cli_cgc_mini,
    train_cyclegan as cli_cyclegan,
    train_gan as cli_gan,
    train_gan3 as cli_gan3,
    train_mini as cli_mini,
    upscale as cli_upscale,
)


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.default_rng(0)
    for sub, size in (("ukiyo-e_fullhd", (64, 48)), ("photo_fullhd", (64, 48))):
        d = tmp_path / "images" / sub
        d.mkdir(parents=True)
        for i in range(6):
            arr = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"im_{i:03d}.jpg", quality=95)
    # cgc dirs: LR frames (quarter size), same filenames
    for sub in ("ukiyo-e_1gen", "ukiyo-e_2gen"):
        d = tmp_path / "images" / sub
        d.mkdir(parents=True)
        for i in range(6):
            arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"im_{i:03d}.jpg", quality=95)
    return tmp_path


def _common(data_root, out):
    return ["--images-root", str(data_root / "images"),
            "--output-root", str(out),
            "-cl", "mse", "-nb", "4", "-msf", "2", "-ic", "6",
            "--res-blocks", "1", "--filters", "8", "-ks", "3",
            "--dtype", "float32"]


def test_train_mini_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_mini.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "2", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"])
    prefix = "mini_orig_mse_x4"
    lossdir = out / "losses" / "ukiyo" / prefix
    assert (lossdir / "parameters.json").exists()
    assert (lossdir / "progress.json").exists()
    rows = open(lossdir / f"losses_upscaler_{prefix}.txt").read().strip().split("\n")
    assert len(rows) == 5  # header + 4 batches
    modeldir = out / "trained_model" / "ukiyo" / prefix
    assert any(n.startswith("step_") for n in os.listdir(modeldir))
    imgdir = out / "example_images" / "ukiyo" / prefix
    assert any("upscaled" in n for n in os.listdir(imgdir))

    # parameters.json round-trips through RunConfig.load
    from video_cycle_gan_upscaling_tpu.utils.config import RunConfig

    cfg = RunConfig.load(str(lossdir / "parameters.json"))
    assert cfg.prefix == prefix

    # inference over the trained checkpoint (whole pipeline)
    res = cli_upscale.main([
        "-r", str(lossdir), "-i", str(data_root / "images" / "ukiyo-e_1gen"),
        "-o", str(tmp_path / "outframes"),
        "--frame-height", "12", "--frame-width", "16",
        "--tile-height", "8", "--tile-width", "8", "--overlap", "2",
        "--max-frames", "2"])
    assert res["frames"] == 2
    outs = os.listdir(tmp_path / "outframes")
    assert len(outs) == 2
    img = Image.open(tmp_path / "outframes" / sorted(outs)[0])
    assert img.size == (64, 48)


def test_train_whole_frame_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_train.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-tr", "0.7", "-m", "skip-con"])
    prefix = "train_skip-con_mse_x4"
    assert (out / "losses" / "ukiyo" / prefix / "parameters.json").exists()


def test_train_cgc_mini_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_cgc_mini.main(_common(data_root, out) + [
        "-bs", "1", "-oh", "16", "-ow", "16", "-tr", "0.7", "-m", "orig"])
    prefix = "cgc_mini_orig_mse_x4"
    lossdir = out / "losses" / "ukiyo" / prefix
    header = open(lossdir / f"losses_upscaler_{prefix}.txt").readline()
    assert "loss_1gen" in header and "loss_scal" in header


def test_train_gan_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_gan.main(_common(data_root, out) + [
        "-bs", "1", "-oh", "16", "-ow", "16", "-tr", "0.7",
        "-m", "orig", "-dm", "patchgan", "-da", "none"])
    prefix = "gan_orig_mse_patchgan_wasserstein_none_x4"
    lossdir = out / "losses" / "ukiyo" / prefix
    header = open(lossdir / f"losses_upscaler_{prefix}.txt").readline()
    assert "loss_disc" in header and "loss_gan_gen" in header
    rows = open(lossdir / f"losses_upscaler_{prefix}.txt").read().strip().split("\n")
    assert len(rows) == 5
    # inference from a GAN-family checkpoint (GanTrainState on disk; the
    # loader must extract the generator params — VERDICT r1 follow-up)
    res = cli_upscale.main([
        "-r", str(lossdir), "-i", str(data_root / "images" / "ukiyo-e_1gen"),
        "-o", str(tmp_path / "gan_outframes"),
        "--frame-height", "12", "--frame-width", "16",
        "--tile-height", "8", "--tile-width", "8", "--overlap", "2",
        "--max-frames", "1"])
    assert res["frames"] == 1


def test_train_gan3_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_gan3.main(_common(data_root, out) + [
        "-bs", "1", "-oh", "16", "-ow", "16", "-tr", "0.7",
        "-m", "orig", "-dm", "patchgan", "-dl", "rel", "-dla", "tanh"])
    prefix = "gan_orig_mse_patchgan_relativistic_none_x4"
    assert (out / "losses" / "ukiyo" / prefix / "progress.json").exists()


def test_train_cyclegan_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_cyclegan.main([
        "--images-root", str(data_root / "images"),
        "--output-root", str(out),
        "-nb", "3", "-msf", "2", "-ic", "6", "-tr", "0.7",
        "--res-blocks", "1", "--filters", "8", "--dtype", "float32",
        "-i", "photo_fullhd", "-ib", "ukiyo-e_fullhd",
        "-bs", "1", "-oh", "16", "-ow", "16"])
    prefix = "cyclegan_cyclegan-resnet_lsgan_x4"
    lossdir = out / "losses" / "ukiyo" / prefix
    header = open(lossdir / f"losses_upscaler_{prefix}.txt").readline()
    assert "loss_cycle" in header and "loss_d_a" in header
    prog = json.load(open(lossdir / "progress.json"))
    assert prog["saved_models"]


def test_resume_continues(data_root, tmp_path):
    out = tmp_path / "run"
    argv = _common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"]
    cli_mini.main(argv)
    # latest periodic checkpoint is at batch 2 (state.step=3); resuming
    # runs 4 more batches -> step 7
    state, row = cli_mini.main(argv + ["--resume"])
    assert int(state.step) == 7


def test_upscale_turbo_e2e(data_root, tmp_path):
    out = tmp_path / "run"
    cli_mini.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"])
    lossdir = out / "losses" / "ukiyo" / "mini_orig_mse_x4"
    res = cli_upscale.main([
        "-r", str(lossdir), "-i", str(data_root / "images" / "ukiyo-e_1gen"),
        "-o", str(tmp_path / "outframes_turbo"), "--turbo",
        "--frame-height", "12", "--frame-width", "16",
        "--tile-height", "8", "--tile-width", "8", "--overlap", "2",
        "--max-frames", "1"])
    assert res["frames"] == 1
    img = Image.open(next((tmp_path / "outframes_turbo").iterdir()))
    assert img.size == (64, 48)


def test_upscale_turbo_mix_e2e(data_root, tmp_path):
    """--turbo-mix SPEC: mixed-precision trunk + tail8 tail through the
    product CLI (whole-frame tile so the fast runner engages)."""
    out = tmp_path / "run"
    cli_mini.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"])
    lossdir = out / "losses" / "ukiyo" / "mini_orig_mse_x4"
    res = cli_upscale.main([
        "-r", str(lossdir), "-i", str(data_root / "images" / "ukiyo-e_1gen"),
        "-o", str(tmp_path / "outframes_mix"), "--turbo-mix", "last1",
        "--frame-height", "12", "--frame-width", "16",
        "--tile-height", "12", "--tile-width", "16", "--overlap", "2",
        "--max-frames", "1"])
    assert res["frames"] == 1
    img = Image.open(next((tmp_path / "outframes_mix").iterdir()))
    assert img.size == (64, 48)


def test_batch_norm_checkpoints_are_train_only(tmp_path):
    # norm='batch' has no running averages, so inference CLIs must refuse
    # such checkpoints (VERDICT.md round-1 item 8).
    import pytest

    from video_cycle_gan_upscaling_tpu.cli.common import reject_batch_norm_inference
    from video_cycle_gan_upscaling_tpu.utils.config import ModelConfig, RunConfig

    cfg = RunConfig(model=ModelConfig(norm="batch"))
    with pytest.raises(SystemExit, match="train-only"):
        reject_batch_norm_inference(cfg)
    reject_batch_norm_inference(RunConfig(model=ModelConfig(norm="instance")))
