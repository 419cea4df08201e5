"""Data pipeline tests (reference parity: data.py:15-248; the jitted
analog of minitrain_test.ipynb / cgc_tests.ipynb — SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from video_cycle_gan_upscaling_tpu.data import (
    CgcBatcher,
    PairBatcher,
    UnpairedBatcher,
    crop_images,
    crop_images_cgc,
    downscale_images,
    join_cgc,
    load_images_from_dir,
    load_images_from_dir_and_downscale,
    prefetch_to_device,
    select_random_rows,
    split_images_train_test,
)


@pytest.fixture
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:03d}.jpg", quality=95)
    (d / "notes.txt").write_text("ignored")
    return str(d)


def test_load_and_downscale(image_dir):
    df = load_images_from_dir_and_downscale(image_dir, ".jpg", downscale_factor=4)
    assert list(df.columns) == ["filename", "image_hr", "image_lr"]
    assert len(df) == 6
    assert df.image_hr[0].size == (96, 64)
    assert df.image_lr[0].size == (24, 16)
    # sorted order
    assert list(df.filename) == sorted(df.filename)


def test_load_with_limit_and_min_shape(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", limit=3, min_shape=(10, 10))
    assert len(df) == 3
    df2 = load_images_from_dir(image_dir, ".jpg", min_shape=(1000, 1000))
    assert len(df2) == 0


def test_downscale_images(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    df = downscale_images(df, 4)
    assert df.downscaled[0].size == (24, 16)


def test_crop_images_seeded_and_ratio_respected(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    a = crop_images(df, target_shape=(32, 32), downscale_ratio=8, seed=7)
    b = crop_images(df, target_shape=(32, 32), downscale_ratio=8, seed=7)
    assert a.crop_shape[0] == b.crop_shape[0]  # seeded reproducibility
    assert a.image_cropped[0].size == (32, 32)
    # the reference hardcoded //4 (data.py:124); we honor the ratio:
    assert a.image_cropped_lr[0].size == (4, 4)


def test_cgc_join_and_quad_crop(image_dir):
    full = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    full = downscale_images(full, 4).rename(columns={"image_hr": "fullhd",
                                                     "downscaled": "scaled"})
    g1 = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    g2 = load_images_from_dir(image_dir, ".jpg", limit=4, min_shape=(10, 10))
    joined = join_cgc(full, g1, g2)
    assert len(joined) == 4  # inner join limited by g2
    # quad-crop alignment: note gen dirs here are full-res stand-ins; crop
    # boxes must satisfy hq == 4 * lq exactly
    joined = joined.assign(
        gen1=[im.resize((24, 16)) for im in joined.gen1],
        gen2=[im.resize((24, 16)) for im in joined.gen2],
    )
    out = crop_images_cgc(joined, target_shape=(32, 32), downscale_ratio=4, seed=3)
    lq, hq = out.crop_shapes_lq[0], out.crop_shapes_hq[0]
    assert tuple(4 * v for v in lq) == hq
    assert out.cropped_hd[0].size == (32, 32)
    assert out.cropped_scaled[0].size == (8, 8)
    assert out.cropped_gen1[0].size == (8, 8)


def test_split_seeded_disjoint(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    tr, te = split_images_train_test(df, 0.5, seed=42)
    tr2, te2 = split_images_train_test(df, 0.5, seed=42)
    assert list(tr.filename) == list(tr2.filename)
    assert set(tr.filename).isdisjoint(set(te.filename))
    assert len(tr) + len(te) == len(df)


def test_select_random_rows_with_replacement(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    rows = select_random_rows(df, n=20, seed=0)
    assert len(rows) == 20


def test_pair_batcher_whole_frames(image_dir):
    df = load_images_from_dir_and_downscale(image_dir, ".jpg", downscale_factor=4)
    lr, hr = PairBatcher(df, batch_size=3, seed=0).next_batch()
    assert lr.shape == (3, 16, 24, 3)
    assert hr.shape == (3, 64, 96, 3)
    assert lr.dtype == np.float32 and -1 <= lr.min() and lr.max() <= 1


def test_pair_batcher_fresh_crops(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    b = PairBatcher(df, batch_size=2, seed=0, crop=(32, 32), downscale_factor=4)
    lr, hr = b.next_batch()
    assert hr.shape == (2, 32, 32, 3)
    assert lr.shape == (2, 8, 8, 3)
    lr2, _ = b.next_batch()
    assert not np.array_equal(lr, lr2)  # re-cropped per batch (train_mini.py:227)


def test_cgc_batcher(image_dir):
    full = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    full = downscale_images(full, 4).rename(columns={"image_hr": "fullhd",
                                                     "downscaled": "scaled"})
    df = full.assign(gen1=full.scaled, gen2=full.scaled)
    df = crop_images_cgc(df, target_shape=(32, 32), downscale_ratio=4, seed=1)
    lr, hr = CgcBatcher(df, batch_size=2, seed=0).next_batch()
    assert lr.shape == (6, 8, 8, 3)   # 3 sources x bs
    assert hr.shape == (6, 32, 32, 3)
    np.testing.assert_array_equal(hr[0], hr[2])  # same HR copied per source
    np.testing.assert_array_equal(hr[0], hr[4])


def test_unpaired_batcher(image_dir):
    df = load_images_from_dir(image_dir, ".jpg", min_shape=(10, 10))
    a, b = UnpairedBatcher(df, df, batch_size=2, seed=0, crop=(32, 32)).next_batch()
    assert a.shape == (2, 32, 32, 3)
    assert b.shape == (2, 32, 32, 3)
    assert not np.array_equal(a, b)


def test_prefetch_to_device(image_dir):
    df = load_images_from_dir_and_downscale(image_dir, ".jpg")
    batcher = PairBatcher(df, batch_size=1, seed=0)
    import itertools

    it = prefetch_to_device(itertools.islice(iter(batcher), 3), size=2)
    batches = list(it)
    assert len(batches) == 3
    import jax

    assert isinstance(batches[0][0], jax.Array)
