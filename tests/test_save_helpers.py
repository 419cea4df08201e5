"""Reference writer-API parity tests (data.py:253-363 surface)."""

import os

import numpy as np
import pandas as pd
from PIL import Image

from video_cycle_gan_upscaling_tpu.data import save as S


def _df(n=3):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        hr = Image.fromarray(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8))
        lr = hr.resize((12, 8))
        rows.append({"filename": f"f{i}.jpg", "image_hr": hr, "image_lr": lr})
    return pd.DataFrame(rows)


def test_convert_imagesdf_to_arrays():
    hr, lr = S.convert_imagesdf_to_arrays(_df())
    assert hr.shape == (3, 32, 48, 3)
    assert lr.shape == (3, 8, 12, 3)


def test_save_and_rescale_array(tmp_path):
    a = np.zeros((8, 8, 3), np.float32)
    S.save_array_as_image(a, str(tmp_path / "a.png"))
    assert Image.open(tmp_path / "a.png").size == (8, 8)
    S.rescale_save_array_as_image(a, str(tmp_path / "b.png"), target_size=(32, 16))
    assert Image.open(tmp_path / "b.png").size == (32, 16)


def test_save_images_orig_and_predicted(tmp_path):
    df = _df()
    S.save_images_orig(df, 0, 2, str(tmp_path), "t", target_size=(48, 32))
    assert os.path.exists(tmp_path / "t_im0000_orig.jpg")
    assert os.path.exists(tmp_path / "t_im0001_lowres.jpg")

    upscaler = lambda x: np.repeat(np.repeat(x, 4, axis=1), 4, axis=2)
    S.save_images_predicted(df, upscaler, 0, 2, str(tmp_path), "t", batch=500)
    out = Image.open(tmp_path / "t_im0000_upscaled_000500.jpg")
    assert out.size == (48, 32)


def test_save_img_series_helpers(tmp_path):
    df = _df()
    S.save_img_orig(df["image_hr"][:2], str(tmp_path), "s")
    S.save_img_resize(df["image_lr"][:2], str(tmp_path), "s", sufix="_1gen",
                      target_size=(48, 32))
    upscaler = lambda x: np.repeat(np.repeat(x, 4, axis=1), 4, axis=2)
    S.save_img_predict(df["image_lr"][:2], upscaler, str(tmp_path), "s", 100,
                       sufix="_scal")
    assert os.path.exists(tmp_path / "s_im0001_orig.jpg")
    assert os.path.exists(tmp_path / "s_im0000_lowres_1gen.jpg")
    assert os.path.exists(tmp_path / "s_im0001_upscaled_000100_scal.jpg")
