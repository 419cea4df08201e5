"""Image-saving helpers — parity with the reference's writer API
(/root/reference/upscaling/upscaler/data.py:253-363).

The trainers use utils/logging.save_sample_images for their artifact
dumps; these named functions mirror the reference surface for users
porting scripts 1:1. ``upscaler`` arguments are callables
``lr_batch -> hr_batch`` (e.g. ``lambda x: model.apply(vars, x)``).
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np
from PIL import Image

from video_cycle_gan_upscaling_tpu.ops.codec import (
    array_to_image,
    image_to_array,
    images_to_batch,
    unit_to_uint8,
)

# reference-compatible aliases (data.py:253-277)
convert_array_to_image = array_to_image
convert_image_to_array = image_to_array
convert_image_series_to_array = images_to_batch


def convert_imagesdf_to_arrays(images_df) -> Tuple[np.ndarray, np.ndarray]:
    """DF(image_hr, image_lr) -> (hr_batch, lr_batch) (data.py:273-277)."""
    return (images_to_batch(images_df["image_hr"]),
            images_to_batch(images_df["image_lr"]))


def save_array_as_image(a: np.ndarray, filename: str, **kwargs) -> None:
    """float [-1,1] HWC -> image file (data.py:284-286)."""
    array_to_image(np.asarray(a)).save(filename, **kwargs)


def rescale_save_array_as_image(a: np.ndarray, filename: str,
                                target_size: Tuple[int, int] = (1920, 1080),
                                **kwargs) -> None:
    """Save with a BICUBIC resize to target (data.py:289-292)."""
    img = array_to_image(np.asarray(a)).resize(target_size, Image.BICUBIC)
    img.save(filename, **kwargs)


def save_images_orig(images_df, idx_start: int, idx_stop: int, path: str,
                     prefix: str, target_size: Tuple[int, int] = (1920, 1080),
                     quality: int = 95, ext: str = "jpg") -> None:
    """First-N lowres (bicubic-upscaled) + orig dumps (data.py:295-305)."""
    idx_stop = min(idx_stop, len(images_df))
    for idx in range(idx_start, idx_stop):
        img = images_df["image_lr"].iloc[idx].resize(target_size, Image.BICUBIC)
        img.save(f"{path}/{prefix}_im{idx:04d}_lowres.{ext}", quality=quality)
        images_df["image_hr"].iloc[idx].save(
            f"{path}/{prefix}_im{idx:04d}_orig.{ext}", quality=quality)


def save_images_predicted(images_df, upscaler: Callable, idx_start: int,
                          idx_stop: int, path: str, prefix: str, batch: int,
                          quality: int = 95, ext: str = "jpg") -> None:
    """Model-output dumps for first-N rows (data.py:308-315)."""
    idx_stop = min(idx_stop, len(images_df))
    for idx in range(idx_start, idx_stop):
        ex = images_to_batch([images_df["image_lr"].iloc[idx]])
        out = np.asarray(upscaler(ex))[0]
        save_array_as_image(
            out, f"{path}/{prefix}_im{idx:04d}_upscaled_{batch:06d}.{ext}",
            quality=quality)


def save_images_orig_png(images_df, idx_start, idx_stop, path, prefix,
                         target_size=(1920, 1080)) -> None:
    save_images_orig(images_df, idx_start, idx_stop, path, prefix,
                     target_size, quality=95, ext="png")


def save_images_predicted_png(images_df, upscaler, idx_start, idx_stop, path,
                              prefix, batch) -> None:
    save_images_predicted(images_df, upscaler, idx_start, idx_stop, path,
                          prefix, batch, ext="png")


def save_img_orig(images_series: Iterable, path: str, prefix: str,
                  quality: int = 95) -> None:
    """(data.py:345-348)"""
    for idx, img in enumerate(images_series):
        img.save(f"{path}/{prefix}_im{idx:04d}_orig.jpg", quality=quality)


def save_img_resize(images_series: Iterable, path: str, prefix: str,
                    sufix: str = "", target_size: Tuple[int, int] = (1080, 1920),
                    quality: int = 95) -> None:
    """(data.py:351-355)"""
    for idx, img in enumerate(images_series):
        img = img.resize(target_size, Image.BICUBIC)
        img.save(f"{path}/{prefix}_im{idx:04d}_lowres{sufix}.jpg", quality=quality)


def save_img_predict(images_series: Iterable, upscaler: Callable, path: str,
                     prefix: str, batch: int, sufix: str = "",
                     quality: int = 95) -> None:
    """(data.py:358-363)"""
    for idx, img in enumerate(images_series):
        ex = images_to_batch([img])
        out = np.asarray(upscaler(ex))[0]
        save_array_as_image(
            out, f"{path}/{prefix}_im{idx:04d}_upscaled_{batch:06d}{sufix}.jpg",
            quality=quality)
