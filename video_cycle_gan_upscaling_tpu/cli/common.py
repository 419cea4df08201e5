"""Shared CLI harness for the trainer entry points.

Flag surface mirrors the reference argparse scripts
(/root/reference/upscaling/train.py:26-56 canonical; GAN extras
train_gan3.py:55-98) — same short flags, same defaults, same 'auto'
prefix generation and {trained_model,losses,example_images}/<subdir>/
<prefix>/ output layout (train.py:99-119) — plus TPU-native extras
(--norm, --learning-rate, --dtype, --data-parallel, --resume).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_cycle_gan_upscaling_tpu.losses import (
    make_adversarial_losses,
    make_content_loss,
    make_content_loss_per_example,
)
from video_cycle_gan_upscaling_tpu.models import make_discriminator, make_generator
from video_cycle_gan_upscaling_tpu.models.vgg import get_extractor
from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
from video_cycle_gan_upscaling_tpu.utils.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    RunConfig,
    TrainConfig,
)
from video_cycle_gan_upscaling_tpu.utils.logging import LossLog, ProgressTracker


def reject_batch_norm_inference(cfg: RunConfig) -> None:
    """Refuse eval/inference on a norm='batch' checkpoint.

    norm='batch' trains with stateless per-batch statistics and keeps no
    running averages (ops/pallas/norms.py batch_norm_act), so eval-mode /
    batch-size-1 inference cannot reproduce what the reference's Keras
    BatchNorm would do with its moving averages — the statistics would
    come from the inference batch itself. Train with the default
    norm='instance' for checkpoints meant for inference (CLAUDE.md
    conventions; VERDICT.md round-1 item 8).
    """
    if cfg.model.norm == "batch":
        raise SystemExit(
            "norm='batch' checkpoints are train-only: batch norm is "
            "stateless per-batch statistics (no running averages), so "
            "inference statistics would come from the inference batch, "
            "not training data. Retrain with --norm instance (default).")


def build_parser(family: str, defaults: Optional[dict] = None) -> argparse.ArgumentParser:
    d = {
        "image_input_dir": "ukiyo-e_fullhd", "subdir": "ukiyo",
        "image_count": 3000, "train_test_ratio": 0.95 if "gan" in family else 0.8,
        "generator_model": "orig", "discriminator_model": "simple-512",
        "discriminator_activation": "none", "content_loss": "vgg-only",
        "discriminator_loss": "wasserstein", "discriminator_loss_weight": 1e-10,
        "non_vgg_loss_weight": 0.001, "model_save_freq": 500, "batch_size": 2,
        "output_height": 512, "output_width": 512, "number_of_batches": 400001,
        "downscale_factor": 4, "kernel_size": 5, "dropout_rate": 0.0,
        "split_seed": 42,
    }
    d.update(defaults or {})
    p = argparse.ArgumentParser(description=f"TPU-native trainer: {family}")
    p.add_argument("-i", "--image_input_dir", default=d["image_input_dir"],
                   help='Path to load images from (subdir of images root)')
    p.add_argument("-i1g", "--image_input_dir_1gen", default="ukiyo-e_1gen")
    p.add_argument("-i2g", "--image_input_dir_2gen", default="ukiyo-e_2gen")
    p.add_argument("-s", "--subdir", default=d["subdir"])
    p.add_argument("-p", "--output_prefix", default="auto")
    p.add_argument("-ic", "--image_count", type=int, default=d["image_count"])
    p.add_argument("-tr", "--train_test_ratio", type=float, default=d["train_test_ratio"])
    p.add_argument("-m", "-gm", "--generator_model", dest="generator_model",
                   default=d["generator_model"],
                   choices=["orig", "skip-con", "resnet-att", "inc-resnet",
                            "unetish", "unetish-add", "unetish-complex",
                            "cyclegan-resnet"])
    p.add_argument("-dm", "--discriminator_model", default=d["discriminator_model"],
                   choices=["simple-512", "s512", "thin-512", "t512",
                            "sparse-512", "sp512", "patchgan"])
    p.add_argument("-da", "--discriminator_activation",
                   default=d["discriminator_activation"],
                   choices=["none", "sigmoid", "tanh", "log", "log-sigm", "bi-log"])
    p.add_argument("-cl", "-l", "--content_loss", "--loss", dest="content_loss",
                   default=d["content_loss"],
                   choices=["vgg-only", "vgg-mae", "vgg-mse", "mae", "mse"])
    p.add_argument("-dl", "--discriminator_loss", default=d["discriminator_loss"],
                   choices=["wasserstein", "rel", "relativistic", "lsgan"])
    p.add_argument("-dla", "--discriminator_loss_activation", default="log-sigm",
                   choices=["none", "sigmoid", "log-sigm", "tanh", "bi-log"])
    p.add_argument("-dlw", "--discriminator_loss_weight", type=float,
                   default=d["discriminator_loss_weight"])
    p.add_argument("-lw", "--non_vgg_loss_weight", type=float,
                   default=d["non_vgg_loss_weight"])
    p.add_argument("-msf", "--model_save_freq", type=int, default=d["model_save_freq"])
    p.add_argument("-bs", "--batch_size", type=int, default=d["batch_size"])
    p.add_argument("-oh", "--output_height", type=int, default=d["output_height"])
    p.add_argument("-ow", "--output_width", type=int, default=d["output_width"])
    p.add_argument("-nb", "--number_of_batches", type=int, default=d["number_of_batches"])
    p.add_argument("-d", "--downscale_factor", type=int, default=d["downscale_factor"])
    p.add_argument("-ks", "--kernel_size", type=int, default=d["kernel_size"])
    p.add_argument("-dr", "--dropout_rate", type=float, default=d["dropout_rate"])
    p.add_argument("-ss", "--split_seed", type=int, default=d["split_seed"])
    # ---- TPU-native extras ---------------------------------------------
    p.add_argument("--images-root", default=None,
                   help="Images root (default: <script_dir>/../images)")
    p.add_argument("--output-root", default=".",
                   help="Root for trained_model/losses/example_images trees")
    p.add_argument("--norm", default="instance",
                   choices=["instance", "batch", "none"])
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard the batch over all local devices (DP over ICI)")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in the run dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--res-blocks", type=int, default=16,
                   help="Residual blocks in the generator trunk")
    p.add_argument("--filters", type=int, default=64,
                   help="Base filter count of the generator")
    p.add_argument("--vgg-weights", default=None,
                   help=".npz VGG19 weights (default: env VCGU_VGG19_WEIGHTS "
                        "or seeded-random fallback)")
    return p


def config_from_args(args, family: str) -> RunConfig:
    act = {"log": "log-sigm"}.get(args.discriminator_activation,
                                  args.discriminator_activation)
    adv = {"rel": "relativistic"}.get(args.discriminator_loss,
                                     args.discriminator_loss)
    return RunConfig(
        data=DataConfig(
            images_root=args.images_root or "../images",
            image_input_dir=args.image_input_dir,
            image_input_dir_1gen=args.image_input_dir_1gen,
            image_input_dir_2gen=args.image_input_dir_2gen,
            image_count=args.image_count,
            train_test_ratio=args.train_test_ratio,
            split_seed=args.split_seed,
        ),
        model=ModelConfig(
            generator=args.generator_model,
            discriminator=args.discriminator_model,
            discriminator_activation=act,
            kernel_size=args.kernel_size,
            dropout_rate=args.dropout_rate,
            norm=args.norm,
            res_block_num=args.res_blocks,
            filters=args.filters,
        ),
        loss=LossConfig(
            content_loss=args.content_loss,
            non_vgg_loss_weight=args.non_vgg_loss_weight,
            adversarial_loss=adv,
            adversarial_loss_weight=args.discriminator_loss_weight,
            loss_activation=args.discriminator_loss_activation,
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            output_height=args.output_height,
            output_width=args.output_width,
            number_of_batches=args.number_of_batches,
            downscale_factor=args.downscale_factor,
            model_save_freq=args.model_save_freq,
            learning_rate=args.learning_rate,
            seed=args.seed,
            compute_dtype=args.dtype,
            data_parallel=args.data_parallel,
        ),
        family=family,
        subdir=args.subdir,
        output_prefix=args.output_prefix,
        output_root=args.output_root,
    )


class Run:
    """Resolved run context: dirs, logs, checkpoints, models, losses."""

    def __init__(self, cfg: RunConfig, metric_columns, vgg_weights=None,
                 resume: bool = False):
        self.cfg = cfg
        self.resume = resume
        self.dirs = cfg.make_run_dirs()
        prefix = cfg.prefix
        print(f"Generated images will be saved to: '{self.dirs['images']}'")
        print(f"Trained models will be saved to: '{self.dirs['models']}'")
        print(f"Loss values and training parameters will be saved to: "
              f"'{self.dirs['losses']}'")

        cols = ["batch"]
        for m in metric_columns:
            cols += [m, f"agg_{m}"]
        cols += ["sec_per_batch"]
        self.loss_log = LossLog(
            os.path.join(self.dirs["losses"], f"losses_upscaler_{prefix}.txt"), cols)
        self.best_log = LossLog(
            os.path.join(self.dirs["losses"], f"losses_upscaler_{prefix}_best.txt"), cols)
        self.progress = ProgressTracker(
            os.path.join(self.dirs["losses"], "progress.json"))
        self.ckpt = CheckpointManager(self.dirs["models"])
        self.dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        self.vgg_weights = vgg_weights

    def save_parameters(self, extra: Optional[dict] = None):
        self.cfg.save(os.path.join(self.dirs["losses"], "parameters.json"), extra)

    def content_loss(self, per_example: bool = False):
        cfg = self.cfg
        vgg = None
        if cfg.loss.content_loss.startswith("vgg"):
            vgg = get_extractor(self.vgg_weights, seed=cfg.train.seed,
                                dtype=self.dtype)
            print(f"VGG19 feature weights: {vgg.source}")
        factory = make_content_loss_per_example if per_example else make_content_loss
        return factory(cfg.loss.content_loss, cfg.loss.non_vgg_loss_weight, vgg)

    def adversarial(self):
        return make_adversarial_losses(self.cfg.loss.adversarial_loss,
                                       self.cfg.loss.loss_activation)

    def generator(self):
        # head_block=4: the S-blocked training head (generators._head_conv)
        # — same params/math, 16x the MXU output lanes on the 3-channel
        # head; bench GAN step 88.9 -> 76.5 ms (docs/PERF.md round 3)
        return make_generator(self.cfg.model, self.cfg.train.downscale_factor,
                              dtype=self.dtype, head_block=4,
                              trunk_pack=True)

    def discriminator(self):
        return make_discriminator(self.cfg.model, dtype=self.dtype)

    def maybe_resume(self, state):
        if self.resume and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(state)
            print(f"Resumed from step {self.ckpt.latest_step()}")
            return restored
        return state


def images_dir(cfg: RunConfig, which: str = "main") -> str:
    name = {
        "main": cfg.data.image_input_dir,
        "1gen": cfg.data.image_input_dir_1gen,
        "2gen": cfg.data.image_input_dir_2gen,
    }[which]
    return os.path.join(cfg.data.images_root, name)


def save_examples_lr_hr(run: Run, df, prefix_tag: str, n: int = 10,
                        lr_col: str = "image_lr", hr_col: str = "image_hr"):
    """Dump first-n originals + bicubic-upscaled LR (train.py:210-211
    analog)."""
    from video_cycle_gan_upscaling_tpu.utils.logging import save_sample_images
    from PIL import Image

    prefix = f"{run.cfg.prefix}_{prefix_tag}"
    path = run.dirs["images"]
    n = min(n, len(df))
    save_sample_images(list(df[hr_col][:n]), path, prefix)
    ups = [img.resize((img.size[0] * run.cfg.train.downscale_factor,
                       img.size[1] * run.cfg.train.downscale_factor),
                      Image.BICUBIC) for img in df[lr_col][:n]]
    save_sample_images(ups, path, prefix, suffix="_lowres", batch=None)
