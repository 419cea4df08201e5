"""Overlapping-tile inference tests (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_cycle_gan_upscaling_tpu.ops.nn import resize_nearest
from video_cycle_gan_upscaling_tpu.video import (
    make_tiled_upscaler,
    merge_tiles,
    plan_tiles,
    psnr,
    split_tiles,
    ssim,
    tile_windows,
)


def test_plan_covers_frame():
    pos = plan_tiles((100, 100), (40, 40), overlap=8)
    covered = np.zeros((100, 100), bool)
    for (y, x) in pos:
        covered[y:y + 40, x:x + 40] = True
    assert covered.all()
    # last tiles aligned to edges
    assert any(y == 60 for (y, _) in pos)
    assert any(x == 60 for (_, x) in pos)


def test_single_tile_when_tile_ge_frame():
    assert plan_tiles((32, 32), (64, 64), 8) == [(0, 0)]


def test_merge_is_exact_partition_of_unity():
    # constant tiles must reassemble to the exact constant regardless of
    # window overlap pattern
    frame_hw = (50, 70)
    tile_hw = (32, 32)
    pos, wins = tile_windows(frame_hw, tile_hw, overlap=10)
    tiles = jnp.full((len(pos), *tile_hw, 3), 0.37)
    out = merge_tiles(tiles, pos, jnp.asarray(wins), frame_hw)
    np.testing.assert_allclose(np.asarray(out), 0.37, rtol=1e-6)


def test_split_merge_roundtrip_identity():
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (48, 64, 3))
    pos, wins = tile_windows((48, 64), (32, 32), overlap=8)
    tiles = split_tiles(frame, pos, (32, 32))
    out = merge_tiles(tiles, pos, jnp.asarray(wins), (48, 64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(frame), atol=1e-6)


def test_tiled_upscaler_matches_whole_frame_for_local_op():
    # nearest-neighbor x4 is tile-local: tiled == whole-frame exactly
    apply_fn = lambda params, x: resize_nearest(x, 4)
    up = make_tiled_upscaler(apply_fn, (40, 56), (24, 24), overlap=8,
                             upscale_factor=4)
    frame = jax.random.uniform(jax.random.PRNGKey(1), (40, 56, 3))
    out = up({}, frame)
    expect = resize_nearest(frame[None], 4)[0]
    assert out.shape == (160, 224, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_tiled_upscaler_psnr_vs_whole_frame_convnet():
    # with norm='none' the generator is purely local: a sufficient overlap
    # halo must make tiled inference match the whole-frame pass tightly
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    model = UpscalerOrig(res_block_num=2, filters=8, kernel_size=3, norm="none")
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (40, 56, 3), minval=-1, maxval=1)
    variables = model.init(key, frame[None])
    apply_fn = lambda p, x: model.apply(p, x)

    whole = model.apply(variables, frame[None])[0]
    up = make_tiled_upscaler(apply_fn, (40, 56), (24, 24), overlap=16,
                             upscale_factor=4)
    tiled = up(variables, frame)
    db = float(psnr(whole, tiled))
    assert db > 45.0, f"tiled vs whole PSNR too low: {db:.2f} dB"


def test_tiled_upscaler_instance_norm_delta_bounded():
    # InstanceNorm couples each tile's statistics: tiled != whole-frame by
    # design. The blend must still keep the delta visually negligible.
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    model = UpscalerOrig(res_block_num=2, filters=8, kernel_size=3)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (40, 56, 3), minval=-1, maxval=1)
    variables = model.init(key, frame[None])
    whole = model.apply(variables, frame[None])[0]
    up = make_tiled_upscaler(lambda p, x: model.apply(p, x), (40, 56),
                             (24, 24), overlap=12, upscale_factor=4)
    tiled = up(variables, frame)
    db = float(psnr(whole, tiled))
    assert db > 32.0, f"tiled-vs-whole InstanceNorm delta too large: {db:.2f} dB"


def test_tile_batching_equivalent():
    apply_fn = lambda params, x: resize_nearest(x, 2)
    frame = jax.random.uniform(jax.random.PRNGKey(2), (48, 48, 3))
    up_all = make_tiled_upscaler(apply_fn, (48, 48), (16, 16), 4, 2)
    up_chunk = make_tiled_upscaler(apply_fn, (48, 48), (16, 16), 4, 2,
                                   tile_batch=4)
    np.testing.assert_allclose(np.asarray(up_all({}, frame)),
                               np.asarray(up_chunk({}, frame)), atol=1e-6)


def test_psnr_ssim_sanity():
    a = jnp.zeros((1, 32, 32, 3))
    assert float(psnr(a, a)) > 100
    assert float(ssim(a, a)) == 1.0
    b = a + 0.1
    assert 20 < float(psnr(a, b)) < 30  # 10*log10(4/0.01) = 26 dB
    assert float(ssim(a, b)) < 1.0
