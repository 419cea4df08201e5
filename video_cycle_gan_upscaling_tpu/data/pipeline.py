"""Batch production: host sampling/augmentation -> device prefetch.

The reference converts PIL->float synchronously inside its hot loop
(train.py:217-219, SURVEY.md §3.1). Here batchers produce numpy batches on
a background thread and ``prefetch_to_device`` keeps a bounded queue of
device-resident arrays so the TPU step never waits on PIL/JPEG work.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np
import pandas as pd

from video_cycle_gan_upscaling_tpu.data import dataset as D
from video_cycle_gan_upscaling_tpu.ops.codec import images_to_batch


class PairBatcher:
    """(lr, hr) batches from a DF with image_lr/image_hr PIL columns —
    train.py's sampler (select_random_rows + convert, train.py:217-219).

    With ``crop`` set, re-crops fresh every batch like train_mini.py:227:
    aligned random HR crop + LANCZOS LR downscale.
    """

    def __init__(self, df: pd.DataFrame, batch_size: int, seed: int = 0,
                 crop: Optional[Tuple[int, int]] = None,
                 downscale_factor: int = 4,
                 lr_col: str = "image_lr", hr_col: str = "image_hr"):
        self.df = df
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.crop = crop
        self.factor = downscale_factor
        self.lr_col, self.hr_col = lr_col, hr_col

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.next_batch()

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        rows = D.select_random_rows(self.df, self.batch_size, self.rng)
        if self.crop is not None:
            rows = rows.rename(columns={self.hr_col: "image_hr"}) \
                if self.hr_col != "image_hr" else rows
            rows = D.crop_images(rows, target_shape=self.crop,
                                 downscale_ratio=self.factor, seed=self.rng,
                                 method=D.LANCZOS)
            hr = images_to_batch(rows["image_cropped"])
            lr = images_to_batch(rows["image_cropped_lr"])
        else:
            hr = images_to_batch(rows[self.hr_col])
            lr = images_to_batch(rows[self.lr_col])
        return lr, hr


class CgcBatcher:
    """cgc batches: LR = concat[gen1 | gen2 | scaled] crops, HR = the
    aligned fullhd crop repeated 3x (train_gan.py:298-304 /
    train_cgc_mini.py:269-275 parity). ``fresh_crops`` re-crops the quad
    every batch; otherwise uses the precomputed cropped_* columns."""

    SOURCES = ("cropped_gen1", "cropped_gen2", "cropped_scaled")

    def __init__(self, df: pd.DataFrame, batch_size: int, seed: int = 0,
                 fresh_crops: bool = False,
                 crop: Optional[Tuple[int, int]] = None,
                 downscale_factor: int = 4):
        self.df = df
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.fresh_crops = fresh_crops
        self.crop = crop
        self.factor = downscale_factor

    def __iter__(self):
        while True:
            yield self.next_batch()

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        rows = D.select_random_rows(self.df, self.batch_size, self.rng)
        if self.fresh_crops:
            rows = D.crop_images_cgc(rows, target_shape=self.crop,
                                     downscale_ratio=self.factor, seed=self.rng)
        lr = np.concatenate([images_to_batch(rows[c]) for c in self.SOURCES])
        hr_one = images_to_batch(rows["cropped_hd"])
        hr = np.concatenate([hr_one, hr_one, hr_one])
        return lr, hr


class UnpairedBatcher:
    """Independent (domain_a, domain_b) batches for CycleGAN training."""

    def __init__(self, df_a: pd.DataFrame, df_b: pd.DataFrame, batch_size: int,
                 seed: int = 0, crop: Optional[Tuple[int, int]] = None,
                 col_a: str = "image_hr", col_b: str = "image_hr"):
        self.df_a, self.df_b = df_a, df_b
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.crop = crop
        self.col_a, self.col_b = col_a, col_b

    def __iter__(self):
        while True:
            yield self.next_batch()

    def _sample(self, df, col):
        rows = D.select_random_rows(df, self.batch_size, self.rng)
        if self.crop is not None:
            rows = rows.rename(columns={col: "image_hr"}) if col != "image_hr" else rows
            rows = D.crop_images(rows, target_shape=self.crop, seed=self.rng)
            return images_to_batch(rows["image_cropped"])
        return images_to_batch(rows[col])

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._sample(self.df_a, self.col_a), self._sample(self.df_b, self.col_b)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Run ``iterator`` on a daemon thread; device_put each batch (with an
    optional jax.sharding.Sharding for data-parallel layouts) into a
    bounded queue. Yields device arrays ready for the jitted step."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def producer():
        try:
            for item in iterator:
                if sharding is not None:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), item)
                else:
                    item = jax.tree_util.tree_map(jax.device_put, item)
                q.put(item)
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
