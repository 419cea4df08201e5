"""Dataclass config system with the reference's knob surface.

The reference uses one argparse parser per trainer script (~14-25 flags,
upscaling/train.py:26-56 canonical, GAN extras train_gan3.py:55-98). Here a
single set of dataclasses covers that surface; each CLI builds a ``RunConfig``
from argparse and persists the resolved config as ``parameters.json``
(train.py:140-146 parity) via utils.json_codec.ArtifactEncoder.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

from video_cycle_gan_upscaling_tpu.utils.json_codec import ArtifactEncoder

GENERATORS = (
    "orig", "skip-con", "resnet-att", "inc-resnet",
    "unetish", "unetish-add", "unetish-complex", "cyclegan-resnet",
)
DISCRIMINATORS = ("simple-512", "thin-512", "sparse-512", "patchgan")
CONTENT_LOSSES = ("vgg-only", "vgg-mae", "vgg-mse", "mae", "mse")
ADV_LOSSES = ("wasserstein", "relativistic", "lsgan")
LOSS_ACTIVATIONS = ("none", "sigmoid", "log-sigm", "tanh", "bi-log")


@dataclass
class DataConfig:
    """L2 data pipeline knobs (train.py:28-41, train_gan.py:28-40 parity)."""
    images_root: str = "../images"
    image_input_dir: str = "ukiyo-e_fullhd"
    image_input_dir_1gen: str = "ukiyo-e_1gen"
    image_input_dir_2gen: str = "ukiyo-e_2gen"
    ext: str = ".jpg"
    image_count: int = 3000
    train_test_ratio: float = 0.95
    split_seed: int = 42


@dataclass
class ModelConfig:
    generator: str = "orig"
    discriminator: str = "simple-512"
    discriminator_activation: str = "none"  # {none,sigmoid,log-sigm,tanh,bi-log}
    kernel_size: int = 5
    filters: int = 64
    res_block_num: int = 16
    dropout_rate: float = 0.0
    norm: str = "instance"  # {'instance','batch','none'}: InstanceNorm is
    # the TPU-native default (SURVEY.md §7); 'batch' is stateless
    # per-batch BatchNorm for reference compatibility (no running stats).
    # Inception stage config (train_gan2.py:87-99 parity).
    a_block_type: str = "3path"
    a_block_num: int = 5
    a_block_kernel: int = 3
    b_block_type: str = "2path"
    b_block_num: int = 10
    b_block_kernel: int = 7
    c_block_type: str = "2path"
    c_block_num: int = 5
    c_block_kernel: int = 3
    # U-Net-ish config (model.py:570 defaults).
    unet_step_size: int = 4
    unet_downscale_times: int = 5
    unet_initial_filters: int = 32


@dataclass
class LossConfig:
    content_loss: str = "vgg-only"
    non_vgg_loss_weight: float = 0.001  # rate for vgg-mse / vgg-mae (train.py:38)
    content_loss_weight: float = 1.0
    adversarial_loss: str = "wasserstein"
    adversarial_loss_weight: float = 1e-10  # train_gan.py:52 default
    loss_activation: str = "log-sigm"  # gan3 -dla flag (train_gan3.py:63)
    # CycleGAN extras (BASELINE config 3).
    cycle_loss_weight: float = 10.0
    identity_loss_weight: float = 5.0


@dataclass
class TrainConfig:
    batch_size: int = 2
    output_height: int = 512
    output_width: int = 512
    number_of_batches: int = 400001
    downscale_factor: int = 4
    model_save_freq: int = 500
    learning_rate: float = 1e-3  # Keras Adam() default lr (model.py:1026)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    ewma_rate: float = 0.01  # loss_update_rate (train.py:184)
    seed: int = 0
    compute_dtype: str = "bfloat16"
    data_parallel: bool = False  # shard batch over jax mesh (BASELINE config 5)
    replay_buffer_size: int = 50  # CycleGAN fake-image pool


@dataclass
class RunConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    family: str = "train"  # {train,mini,cgc,cgc_mini,gan,gan3,cyclegan}
    subdir: str = "ukiyo"
    output_prefix: str = "auto"
    output_root: str = "."

    def __post_init__(self):
        f = self.train.downscale_factor
        if 2 ** int(math.log2(f)) != f:
            raise ValueError(
                f"Downscale factor needs to be a power of 2. It was {f}."
            )  # train.py:72-74 parity

    # ---- derived shapes -------------------------------------------------
    @property
    def output_shape(self) -> Tuple[int, int, int]:
        return (self.train.output_height, self.train.output_width, 3)

    @property
    def input_shape(self) -> Tuple[int, int, int]:
        f = self.train.downscale_factor
        return (self.train.output_height // f, self.train.output_width // f, 3)

    # ---- naming (train.py:91-93, train_gan3.py:141-143 parity) ----------
    @property
    def prefix(self) -> str:
        if self.output_prefix != "auto":
            return self.output_prefix
        f = self.train.downscale_factor
        if self.family in ("gan", "gan3"):
            return (
                f"gan_{self.model.generator}_{self.loss.content_loss}_"
                f"{self.model.discriminator}_{self.loss.adversarial_loss}_"
                f"{self.model.discriminator_activation}_x{f}"
            )
        if self.family == "cyclegan":
            return f"cyclegan_{self.model.generator}_{self.loss.adversarial_loss}_x{f}"
        return f"{self.family}_{self.model.generator}_{self.loss.content_loss}_x{f}"

    # ---- output directory layout (train.py:99-119 parity) ---------------
    def run_dirs(self) -> dict:
        dirs = {
            "models": os.path.join(self.output_root, "trained_model", self.subdir, self.prefix),
            "losses": os.path.join(self.output_root, "losses", self.subdir, self.prefix),
            "images": os.path.join(self.output_root, "example_images", self.subdir, self.prefix),
        }
        return dirs

    def make_run_dirs(self) -> dict:
        dirs = self.run_dirs()
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        return dirs

    # ---- persistence ----------------------------------------------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["model_prefix"] = self.prefix
        return d

    def save(self, path: str, extra: Optional[dict] = None) -> None:
        payload = self.to_dict()
        if extra:
            payload.update(extra)
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=4, cls=ArtifactEncoder)

    @staticmethod
    def load(path: str) -> "RunConfig":
        with open(path) as fh:
            d = json.load(fh)
        return RunConfig(
            data=DataConfig(**d.get("data", {})),
            model=ModelConfig(**d.get("model", {})),
            loss=LossConfig(**d.get("loss", {})),
            train=TrainConfig(**d.get("train", {})),
            **{k: d[k] for k in ("family", "subdir", "output_prefix", "output_root") if k in d},
        )
