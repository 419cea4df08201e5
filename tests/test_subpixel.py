"""Exactness tests for the phase-space conv reforms (ops/subpixel.py):
bit-level reparameterizations of transpose conv and HR SAME conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp


def test_depth_space_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 12))
    y = sp.depth_to_space(x, 2)
    assert y.shape == (2, 8, 12, 3)
    np.testing.assert_array_equal(np.asarray(sp.space_to_depth(y, 2)),
                                  np.asarray(x))


def test_depth_to_space_layout():
    # phase (a, b) of channel block (a*s+b) lands at HR offset (a, b)
    s, c = 2, 1
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 4)
    y = sp.depth_to_space(x, s)[0, :, :, 0]
    np.testing.assert_array_equal(np.asarray(y), [[0, 1], [2, 3]])


@pytest.mark.parametrize("k,s", [(5, 2), (3, 2), (4, 2), (5, 4), (9, 2), (2, 2)])
def test_conv_transpose_d2s_exact(k, s):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 7, 9, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, 5, 8))
    ref = vops.conv_transpose_same(x, w, stride=s)
    out = sp.conv_transpose_d2s(x, w, stride=s)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_transpose_d2s_with_bias():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 5, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 3, 4))
    b = jax.random.normal(jax.random.PRNGKey(2), (4,))
    ref = vops.conv_transpose_same(x, w, b, stride=2)
    out = sp.conv_transpose_d2s(x, w, b, stride=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s", [(9, 2), (5, 2), (3, 2), (9, 4), (5, 4), (1, 2)])
def test_conv_same_phase_exact(k, s):
    key = jax.random.PRNGKey(0)
    lr_h, lr_w, c_in, c_out = 6, 5, 4, 3
    x_phase = jax.random.normal(key, (2, lr_h, lr_w, s * s * c_in))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, c_in, c_out))
    # reference: d2s -> HR SAME conv -> s2d
    x_hr = sp.depth_to_space(x_phase, s)
    ref = vops.same_conv(x_hr, w)
    ref_phase = sp.space_to_depth(ref, s)
    out = sp.conv_same_phase(x_phase, w, stride=s)
    assert out.shape == ref_phase.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_phase),
                               rtol=1e-4, atol=1e-4)


def test_conv_same_phase_with_bias():
    s = 2
    x_phase = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, s * s * 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (9, 9, 6, 3))
    b = jax.random.normal(jax.random.PRNGKey(2), (3,))
    x_hr = sp.depth_to_space(x_phase, s)
    ref_phase = sp.space_to_depth(vops.same_conv(x_hr, w, b), s)
    out = sp.conv_same_phase(x_phase, w, b, stride=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_phase),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride,r", [(5, 2, 1), (5, 2, 2), (3, 2, 2),
                                        (5, 2, 4), (4, 2, 2)])
def test_transpose_conv_phase_exact(k, stride, r):
    # transpose conv applied at resolution r*LR, in and out of phase space
    key = jax.random.PRNGKey(0)
    c_in, c_out = 3, 5
    x_phase = jax.random.normal(key, (2, 5, 6, r * r * c_in))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, c_in, c_out))
    b = jax.random.normal(jax.random.PRNGKey(2), (c_out,))
    x_hr = sp.depth_to_space(x_phase, r) if r > 1 else x_phase
    ref = vops.conv_transpose_same(x_hr, w, b, stride=stride)
    ref_phase = sp.space_to_depth(ref, r * stride)
    out = sp.transpose_conv_phase(x_phase, w, b, stride, r)
    assert out.shape == ref_phase.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_phase),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("factor,hw", [(2, (8, 12)), (4, (8, 8)), (2, (7, 9))])
def test_upscaler_orig_phase_tail_matches_pixel_path(factor, hw):
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, *hw, 3), minval=-1, maxval=1)
    m_pix = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3,
                         upscale_factor=factor, phase_tail=False)
    m_phase = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3,
                           upscale_factor=factor, phase_tail=True)
    v_pix = m_pix.init(key, x)
    v_phase = m_phase.init(key, x)
    # identical param trees and values
    flat_a = jax.tree_util.tree_leaves_with_path(v_pix)
    flat_b = jax.tree_util.tree_leaves_with_path(v_phase)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_pix = m_pix.apply(v_pix, x)
    out_phase = m_phase.apply(v_phase, x)
    np.testing.assert_allclose(np.asarray(out_phase), np.asarray(out_pix),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("r,extra", [(2, 1), (2, 2), (4, 2), (2, 4)])
def test_conv_same_phase_blocked_exact(r, extra):
    key = jax.random.PRNGKey(0)
    c_in, c_out = 4, 3
    h = w_ = 8  # divisible by extra_block
    x_phase = jax.random.normal(key, (1, h, w_, r * r * c_in))
    w = jax.random.normal(jax.random.PRNGKey(1), (9, 9, c_in, c_out))
    b = jax.random.normal(jax.random.PRNGKey(2), (c_out,))
    x_hr = sp.depth_to_space(x_phase, r)
    ref = vops.same_conv(x_hr, w, b)
    out_phase = sp.conv_same_phase_blocked(x_phase, w, b, r, extra)
    out = sp.depth_to_space(out_phase, r * extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("factor", [2, 4])
def test_upscaler_skipcon_phase_tail_matches_pixel_path(factor):
    from video_cycle_gan_upscaling_tpu.models import UpscalerSkipCon

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 8, 12, 3), minval=-1, maxval=1)
    m_pix = UpscalerSkipCon(res_block_num=1, filters=8, kernel_size=3,
                            upscale_factor=factor, phase_tail=False)
    m_phase = UpscalerSkipCon(res_block_num=1, filters=8, kernel_size=3,
                              upscale_factor=factor, phase_tail=True)
    v_pix = m_pix.init(key, x)
    v_phase = m_phase.init(key, x)
    flat_a = jax.tree_util.tree_leaves_with_path(v_pix)
    flat_b = jax.tree_util.tree_leaves_with_path(v_phase)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_pix = m_pix.apply(v_pix, x)
    out_phase = m_phase.apply(v_phase, x)
    np.testing.assert_allclose(np.asarray(out_phase), np.asarray(out_pix),
                               rtol=2e-4, atol=2e-4)


def test_space_to_depth_axes_roundtrip():
    """space_to_depth_axes inverts depth_to_space_axes per axis pair."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 6, 8, 12)), jnp.float32)
    for s_y, s_x in ((2, 1), (1, 2), (2, 3)):
        hr = sp.depth_to_space_axes(x.reshape(2, 6, 8, 12), s_y, s_x) \
            if 12 % (s_y * s_x) == 0 else None
        if hr is None:
            continue
        back = sp.space_to_depth_axes(hr, s_y, s_x)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
