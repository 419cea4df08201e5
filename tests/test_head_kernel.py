"""Oracle tests: the fused Pallas S=(4,8) head kernel
(ops/pallas/head_s48.py) vs the XLA formulation it replaces
(ops/head_conv.py) — int8 and float paths, both column-pad variants,
both emit modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_cycle_gan_upscaling_tpu.ops import head_conv
from video_cycle_gan_upscaling_tpu.ops.pallas import head_s48

N, H, W2, K2, CO = 2, 12, 8, 64, 96


def _xla_ref(q1, wq, ws, b, px, emit_u8):
    yp = jnp.tanh(head_conv.head_conv_s48_pre(q1, wq, ws, b, px))
    if emit_u8:
        return jnp.clip(jnp.round((yp + 1.0) * 127.5), 0, 255
                        ).astype(jnp.uint8)
    return yp


@pytest.mark.parametrize("px", [(2, 0), (0, 2)])
@pytest.mark.parametrize("emit_u8", [False, True])
def test_head_kernel_int8_matches_xla(px, emit_u8):
    rng = np.random.default_rng(0)
    q1 = jnp.asarray(rng.integers(-127, 128, (N, H, W2, K2)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (6, 4, K2, CO)), jnp.int8)
    ws = jnp.asarray(rng.uniform(1e-4, 3e-4, (CO,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.2, 0.2, (CO,)), jnp.float32)
    got = head_s48.head_s48_fused(q1, wq, ws, b, px, emit_u8=emit_u8,
                                  interpret=True)
    assert got is not None
    ref = _xla_ref(q1, wq, ws, b, px, emit_u8)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    if emit_u8:
        # int32 conv + identical f32 epilogue: at most ULP-of-tanh flips
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, diff.max()
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)


@pytest.mark.parametrize("emit_u8", [False, True])
def test_head_kernel_float_matches_xla(emit_u8):
    rng = np.random.default_rng(1)
    q1 = jnp.asarray(rng.uniform(-1, 1, (N, H, W2, K2)), jnp.float32)
    wq = jnp.asarray(rng.uniform(-0.05, 0.05, (6, 4, K2, CO)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.2, 0.2, (CO,)), jnp.float32)
    px = (2, 0)
    got = head_s48.head_s48_fused(q1, wq, None, b, px, emit_u8=emit_u8,
                                  interpret=True)
    assert got is not None
    ref = _xla_ref(q1, wq, None, b, px, emit_u8)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    if emit_u8:
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-2, diff.max()
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_head_kernel_unsupported_geometry_returns_none():
    rng = np.random.default_rng(2)
    q1 = jnp.asarray(rng.integers(-10, 10, (1, 13, W2, K2)), jnp.int8)
    wq = jnp.asarray(rng.integers(-10, 10, (6, 4, K2, CO)), jnp.int8)
    ws = jnp.ones((CO,), jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)
    assert head_s48.head_s48_fused(q1, wq, ws, b, (2, 0),
                                   interpret=True) is None  # odd H
    assert head_s48.head_s48_fused(
        q1[:, :12], wq, ws, b, (1, 1), interpret=True) is None  # odd pad
