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


def _make_student_asset(tmp_path, factor=2, ship_mode="bf16", ship_fps=1.0,
                        name=None):
    """Write a tiny self-contained student asset (the committed-asset
    format of scripts/distill_student.py) for CLI tests."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 12, 16, 3), jnp.float32))["params"]
    root = tmp_path / "students"
    root.mkdir(parents=True, exist_ok=True)
    stem = root / (name or f"x{factor}_k2")
    meta = {"factor": factor, "blocks": 2, "filters": 8, "kernel_size": 5,
            "geometry": [12, 16], "ship_mode": ship_mode,
            "ship_fps": ship_fps}
    stem.with_suffix(".json").write_text(json.dumps(meta))
    stem.with_suffix(".msgpack").write_bytes(
        serialization.msgpack_serialize(jax.device_get(params)))
    return str(stem)


def test_upscale_student_e2e(tmp_path):
    """VERDICT r4 item 4: a student asset runs through vcgu-upscale and
    its output matches the bench path (FastOrigRunner on the same
    whole-frame tile) exactly at the uint8 codec."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    stem = _make_student_asset(tmp_path)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    ind = tmp_path / "in"
    ind.mkdir()
    Image.fromarray(arr).save(ind / "f_000.png")
    outd = tmp_path / "out_student"
    res = cli_upscale.main(["--student", stem, "-i", str(ind),
                            "-o", str(outd), "--ext", ".png",
                            "--max-frames", "1"])
    assert res["frames"] == 1
    out_img = np.asarray(Image.open(next(outd.iterdir())).convert("RGB"))
    assert out_img.shape == (24, 32, 3)

    params = serialization.msgpack_restore(
        open(stem + ".msgpack", "rb").read())
    r = FastOrigRunner(params, res_block_num=2, upscale_factor=2,
                       tile_hw=(12, 16), quant=False, filters=8)
    x = jnp.asarray(arr, jnp.float32) / 127.5 - 1.0
    ref = np.asarray(jax.jit(r.apply)(jax.device_put(r.qp), x[None])[0],
                     np.float32)
    ref_u8 = np.clip(np.round((ref + 1.0) * 127.5), 0, 255).astype(np.uint8)
    assert np.max(np.abs(out_img.astype(np.int32)
                         - ref_u8.astype(np.int32))) <= 1


def test_upscale_student_auto(tmp_path, monkeypatch):
    """--student auto picks the asset with the best recorded ship_fps
    among those whose metadata records a gate-passing ship_mode."""
    _make_student_asset(tmp_path, ship_mode=None, ship_fps=99.0,
                        name="x2_k9")  # no ship_mode -> not eligible
    stem = _make_student_asset(tmp_path, ship_mode="bf16", ship_fps=5.0)
    monkeypatch.setenv("VCGU_STUDENT_ROOT", str(tmp_path / "students"))
    rng = np.random.default_rng(6)
    ind = tmp_path / "in"
    ind.mkdir()
    Image.fromarray(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                    ).save(ind / "f_000.png")
    res = cli_upscale.main(["--student", "auto", "-i", str(ind),
                            "-o", str(tmp_path / "out_auto"),
                            "--ext", ".png", "--max-frames", "1"])
    assert res["frames"] == 1
    assert os.path.basename(stem) == "x2_k2"


def test_upscale_turbo_trunk_e2e(data_root, tmp_path):
    """--turbo-trunk through the product CLI: the trunk-only quant mode
    must CALIBRATE on the first source frame (ADVICE r4: the uncalibrated
    trained-weights trunk runs static scales into clipping) and stay
    close to the bf16 output."""
    out = tmp_path / "run"
    cli_mini.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"])
    lossdir = out / "losses" / "ukiyo" / "mini_orig_mse_x4"
    ind = tmp_path / "in_png"  # --ext filters BOTH source and sink
    ind.mkdir()
    rng = np.random.default_rng(7)
    Image.fromarray(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                    ).save(ind / "f_000.png")
    common = ["-r", str(lossdir), "-i", str(ind),
              "--frame-height", "12", "--frame-width", "16",
              "--tile-height", "12", "--tile-width", "16", "--overlap", "2",
              "--ext", ".png", "--max-frames", "1"]
    res = cli_upscale.main(common + ["-o", str(tmp_path / "o_ref")])
    assert res["frames"] == 1
    res = cli_upscale.main(common + ["-o", str(tmp_path / "o_trunk"),
                                     "--turbo-trunk"])
    assert res["frames"] == 1
    a = np.asarray(Image.open(next((tmp_path / "o_ref").iterdir()))
                   .convert("RGB"), np.float32)
    b = np.asarray(Image.open(next((tmp_path / "o_trunk").iterdir()))
                   .convert("RGB"), np.float32)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 30.0, f"turbo-trunk output {psnr:.1f} dB vs bf16"


def test_upscale_turbo_s1_e2e(data_root, tmp_path):
    """--turbo-s1 (bf16 stage-0 + int8 stage-1/head, x4 chains) through
    the product CLI: calibrates on the first source frame and stays
    close to the bf16 output."""
    out = tmp_path / "run"
    cli_mini.main(_common(data_root, out) + [
        "-i", "ukiyo-e_fullhd", "-bs", "1", "-oh", "16", "-ow", "16",
        "-tr", "0.7", "-m", "orig"])
    lossdir = out / "losses" / "ukiyo" / "mini_orig_mse_x4"
    ind = tmp_path / "in_png"
    ind.mkdir()
    rng = np.random.default_rng(9)
    Image.fromarray(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                    ).save(ind / "f_000.png")
    common = ["-r", str(lossdir), "-i", str(ind),
              "--frame-height", "12", "--frame-width", "16",
              "--tile-height", "12", "--tile-width", "16", "--overlap", "2",
              "--ext", ".png", "--max-frames", "1"]
    res = cli_upscale.main(common + ["-o", str(tmp_path / "o_ref")])
    assert res["frames"] == 1
    res = cli_upscale.main(common + ["-o", str(tmp_path / "o_s1"),
                                     "--turbo-s1"])
    assert res["frames"] == 1
    a = np.asarray(Image.open(next((tmp_path / "o_ref").iterdir()))
                   .convert("RGB"), np.float32)
    b = np.asarray(Image.open(next((tmp_path / "o_s1").iterdir()))
                   .convert("RGB"), np.float32)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 30.0, f"turbo-s1 output {psnr:.1f} dB vs bf16"


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
