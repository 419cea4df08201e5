"""Host-side dataset layer: directory scan -> PIL decode -> pandas DF.

Functional parity with the reference data pipeline
(/root/reference/upscaling/upscaler/data.py:15-248): in-RAM PIL images in
DataFrames, LANCZOS/BICUBIC downscales, seeded aligned crops, seeded
train/test split and with-replacement batch sampling. Differences by
design:
- RNG is an explicit ``np.random.Generator`` (no global-state save/restore
  dance, data.py:97-99);
- ``crop_images`` honors ``downscale_ratio`` (the reference hardcodes
  ``// 4`` at data.py:124 — a latent bug SURVEY.md §7 says not to copy);
- rows accumulate in lists (the reference's per-row ``DataFrame.append``
  is quadratic and removed in modern pandas).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from PIL import Image

LANCZOS = Image.LANCZOS
BICUBIC = Image.BICUBIC


def _rng(seed) -> np.random.Generator:
    if isinstance(seed, np.random.Generator):
        return seed
    return np.random.default_rng(None if seed is None else seed)


def _list_files(dir_loc: str, ext: str, limit: Optional[int]) -> list:
    files = sorted(f for f in os.listdir(dir_loc) if f.endswith(ext))
    return files[: limit if limit is not None else len(files)]


def load_images_from_dir_and_downscale(
    dir_loc: str, ext: str = ".jpg", limit: Optional[int] = None,
    downscale_factor: int = 4, method=LANCZOS, prog_func=None,
) -> pd.DataFrame:
    """DF(filename, image_hr, image_lr) with LANCZOS-downscaled LR
    (data.py:15-43 parity)."""
    rows = []
    files = _list_files(dir_loc, ext, limit)
    it = prog_func(files) if prog_func else files
    for f in it:
        img = Image.open(os.path.join(dir_loc, f)).convert("RGB")
        lr = img.resize((img.width // downscale_factor,
                         img.height // downscale_factor), method)
        rows.append({"filename": f, "image_hr": img, "image_lr": lr})
    return pd.DataFrame(rows, columns=["filename", "image_hr", "image_lr"])


def load_images_from_dir(
    dir_loc: str, ext: str = ".jpg", limit: Optional[int] = None,
    min_shape: Tuple[int, int] = (256, 256), prog_func=None,
) -> pd.DataFrame:
    """DF(filename, image_size, image_hr), skipping too-small images
    (data.py:46-72 parity)."""
    rows = []
    files = _list_files(dir_loc, ext, limit)
    it = prog_func(files) if prog_func else files
    for f in it:
        img = Image.open(os.path.join(dir_loc, f)).convert("RGB")
        if img.size[0] >= min_shape[0] and img.size[1] >= min_shape[1]:
            rows.append({"filename": f, "image_size": img.size, "image_hr": img})
    return pd.DataFrame(rows, columns=["filename", "image_size", "image_hr"])


def downscale_images(df: pd.DataFrame, downscale_ratio: int,
                     method=BICUBIC, prog_func=None) -> pd.DataFrame:
    """Add a BICUBIC ``downscaled`` column (data.py:75-90 parity)."""
    out = [img.resize((img.size[0] // downscale_ratio,
                       img.size[1] // downscale_ratio), method)
           for img in df["image_hr"]]
    return df.assign(downscaled=out)


def crop_images(df: pd.DataFrame, target_shape: Tuple[int, int] = (256, 256),
                downscale_ratio: Optional[int] = None, seed=None,
                method=BICUBIC) -> pd.DataFrame:
    """Random aligned crop of image_hr to (W, H) ``target_shape``; optional
    matching LR crop at ``downscale_ratio`` (data.py:95-140 parity, with the
    ``//4`` hardcode fixed)."""
    rng = _rng(seed)
    cropped, shapes, lr_crops = [], [], []
    for img in df["image_hr"]:
        wr = img.size[0] - target_shape[0]
        hr_ = img.size[1] - target_shape[1]
        left = int(rng.integers(0, wr + 1))
        top = int(rng.integers(0, hr_ + 1))
        box = (left, top, left + target_shape[0], top + target_shape[1])
        crop = img.crop(box)
        cropped.append(crop)
        shapes.append(box)
        if downscale_ratio:
            lr_crops.append(crop.resize((target_shape[0] // downscale_ratio,
                                         target_shape[1] // downscale_ratio), method))
    out = df.assign(crop_shape=shapes, image_cropped=cropped)
    if downscale_ratio:
        out = out.assign(image_cropped_lr=lr_crops)
    return out


def crop_images_cgc(df: pd.DataFrame, target_shape: Tuple[int, int] = (256, 256),
                    downscale_ratio: int = 4, seed=None) -> pd.DataFrame:
    """The cgc quad-crop: one LR-grid-aligned window cropped consistently
    from scaled/gen1/gen2 (LR coords) and fullhd (coords x ratio) so all
    four stay pixel-aligned (data.py:146-205 parity)."""
    rng = _rng(seed)
    tw, th = target_shape[0] // downscale_ratio, target_shape[1] // downscale_ratio
    lq_shapes, hq_shapes = [], []
    c_hd, c_scaled, c_g1, c_g2 = [], [], [], []
    for _, row in df.iterrows():
        scaled = row["scaled"]
        left = int(rng.integers(0, scaled.size[0] - tw + 1))
        top = int(rng.integers(0, scaled.size[1] - th + 1))
        lq = (left, top, left + tw, top + th)
        hq = tuple(downscale_ratio * v for v in lq)
        lq_shapes.append(lq)
        hq_shapes.append(hq)
        c_scaled.append(row["scaled"].crop(lq))
        c_g1.append(row["gen1"].crop(lq))
        c_g2.append(row["gen2"].crop(lq))
        c_hd.append(row["fullhd"].crop(hq))
    return df.assign(
        crop_shapes_lq=lq_shapes, crop_shapes_hq=hq_shapes,
        cropped_hd=c_hd, cropped_scaled=c_scaled,
        cropped_gen1=c_g1, cropped_gen2=c_g2,
    )


def join_cgc(images_fullhd: pd.DataFrame, images_1gen: pd.DataFrame,
             images_2gen: pd.DataFrame) -> pd.DataFrame:
    """Inner-join the three source directories by filename
    (train_gan.py:181-184 / train_cgc.py:166-169 parity). Inputs: fullhd DF
    with columns (filename, fullhd, scaled), gen DFs with (filename, image)."""
    g1 = images_1gen.rename(columns={"image_hr": "gen1"})[["filename", "gen1"]]
    g2 = images_2gen.rename(columns={"image_hr": "gen2"})[["filename", "gen2"]]
    return (images_fullhd
            .join(g1.set_index("filename"), on="filename", how="inner")
            .join(g2.set_index("filename"), on="filename", how="inner")
            .reset_index(drop=True))


def split_images_train_test(df: pd.DataFrame, train_test_ratio: float = 0.8,
                            seed=None) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Seeded random split by row sampling (data.py:215-232 parity)."""
    rng = _rng(seed)
    n = df.shape[0]
    n_train = int(round(n * train_test_ratio))
    train_ids = rng.choice(n, size=n_train, replace=False)
    mask = np.zeros(n, dtype=bool)
    mask[train_ids] = True
    return (df.iloc[train_ids].reset_index(drop=True),
            df.iloc[~mask].reset_index(drop=True))


def select_random_rows(df: pd.DataFrame, n: int = 1, seed=None) -> pd.DataFrame:
    """Sample n rows with replacement — the batch sampler
    (data.py:238-248 parity)."""
    rng = _rng(seed)
    idx = rng.integers(0, df.shape[0], size=n)
    return df.iloc[idx].reset_index(drop=True)
