"""Dataset evaluation CLI — the module-form rebuild of the reference's
testing notebooks (SURVEY.md §2.5):

- plain mode (upscaler_mini_testing.ipynb parity): for every dataset frame
  write {orig, lowres-bicubic, upscaled} JPEG triplets,
- cgc mode (upscaler_mini_cgc_testing.ipynb parity): 7 files per frame —
  orig + bicubic of scaled/gen1/gen2 + model output on scaled/gen1/gen2,

plus a quantitative upgrade the reference lacked entirely: a PSNR/SSIM
table (metrics.tsv) against ground truth for every output.
Inference runs through the fixed-shape tiled path (no per-size graph
rebuilds).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np
from PIL import Image

from video_cycle_gan_upscaling_tpu.data import (
    downscale_images,
    join_cgc,
    load_images_from_dir,
    load_images_from_dir_and_downscale,
)
from video_cycle_gan_upscaling_tpu.models import make_generator
from video_cycle_gan_upscaling_tpu.ops.codec import array_to_image, image_to_array
from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
from video_cycle_gan_upscaling_tpu.utils.config import RunConfig
from video_cycle_gan_upscaling_tpu.utils.logging import LossLog
from video_cycle_gan_upscaling_tpu.video.metrics import psnr, ssim
from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler


def _load_model(args):
    cfg = RunConfig.load(os.path.join(args.run_dir, "parameters.json"))
    from video_cycle_gan_upscaling_tpu.cli.common import reject_batch_norm_inference

    reject_batch_norm_inference(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    model = make_generator(cfg.model, cfg.train.downscale_factor, dtype=dtype,
                           phase_tail=(cfg.model.generator == "orig"))
    ckpt = CheckpointManager(args.checkpoint_dir or cfg.run_dirs()["models"])
    # structure-agnostic restore: GAN/CycleGAN checkpoints store the full
    # multi-network state; inference only needs the generator params
    params = ckpt.restore_generator_params(
        family=cfg.family, best=args.best, step=args.step)
    return cfg, model, params


def main(argv=None):
    p = argparse.ArgumentParser(description="Dataset evaluation")
    p.add_argument("-r", "--run-dir", required=True)
    p.add_argument("-c", "--checkpoint-dir", default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("-i", "--image-dir", required=True,
                   help="HR ground-truth dir (fullhd)")
    p.add_argument("-i1g", "--image-dir-1gen", default=None)
    p.add_argument("-i2g", "--image-dir-2gen", default=None)
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("-ic", "--image-count", type=int, default=100)
    p.add_argument("--tile-height", type=int, default=135)
    p.add_argument("--tile-width", type=int, default=240)
    p.add_argument("--overlap", type=int, default=16)
    p.add_argument("--quality", type=int, default=95)
    args = p.parse_args(argv)

    cfg, model, params = _load_model(args)
    factor = cfg.train.downscale_factor
    os.makedirs(args.output_dir, exist_ok=True)
    cgc = args.image_dir_1gen is not None

    if cgc:
        full = load_images_from_dir(args.image_dir, limit=args.image_count,
                                    min_shape=(1, 1))
        full = downscale_images(full, factor)
        full = full.rename(columns={"image_hr": "fullhd", "downscaled": "scaled"})
        g1 = load_images_from_dir(args.image_dir_1gen, min_shape=(1, 1))
        g2 = load_images_from_dir(args.image_dir_2gen or args.image_dir_1gen,
                                  min_shape=(1, 1))
        df = join_cgc(full, g1, g2)
        sources = [("scal", "scaled"), ("1gen", "gen1"), ("2gen", "gen2")]
    else:
        df = load_images_from_dir_and_downscale(
            args.image_dir, limit=args.image_count, downscale_factor=factor)
        sources = [("lowres", "image_lr")]

    if len(df) == 0:
        raise SystemExit("no frames found")

    lr0 = df[sources[0][1]][0]
    frame_hw = (lr0.size[1], lr0.size[0])
    upscale = make_tiled_upscaler(
        lambda prm, x: model.apply({"params": prm}, x), frame_hw,
        (min(args.tile_height, frame_hw[0]), min(args.tile_width, frame_hw[1])),
        args.overlap, factor)

    metrics_log = LossLog(os.path.join(args.output_dir, "metrics.tsv"),
                          ["frame"] + [f"{t}_{m}" for t, _ in sources
                                       for m in ("psnr", "ssim")]
                          + [f"{t}_bicubic_psnr" for t, _ in sources])
    agg = {}
    for idx, row in df.iterrows():
        hr_col = "fullhd" if cgc else "image_hr"
        hr_img = row[hr_col]
        hr_img.save(os.path.join(args.output_dir, f"im{idx:04d}_orig.jpg"),
                    quality=args.quality)
        hr_arr = image_to_array(hr_img)
        rec = {"frame": idx}
        for tag, col in sources:
            lr_img = row[col]
            bicubic = lr_img.resize(hr_img.size, Image.BICUBIC)
            bicubic.save(os.path.join(
                args.output_dir, f"im{idx:04d}_{tag}_bicubic.jpg"),
                quality=args.quality)
            out = np.asarray(upscale(params, image_to_array(lr_img)))
            array_to_image(out).save(os.path.join(
                args.output_dir, f"im{idx:04d}_{tag}_upscaled.jpg"),
                quality=args.quality)
            rec[f"{tag}_psnr"] = float(psnr(hr_arr, out))
            rec[f"{tag}_ssim"] = float(ssim(hr_arr, out))
            rec[f"{tag}_bicubic_psnr"] = float(psnr(hr_arr, image_to_array(bicubic)))
        metrics_log.append(rec)
        for k, v in rec.items():
            if k != "frame":
                agg.setdefault(k, []).append(v)

    summary = {k: float(np.mean(v)) for k, v in agg.items()}
    with open(os.path.join(args.output_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
