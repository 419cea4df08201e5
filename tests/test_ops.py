"""Unit tests for ops.nn primitives against reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.ops import nn as vops


def test_same_conv_shape_and_identity_kernel():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3) / 100
    # 1x1 identity kernel
    w = jnp.eye(3, dtype=jnp.float32).reshape(1, 1, 3, 3)
    y = vops.same_conv(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_same_conv_stride2_shape():
    x = jnp.ones((1, 9, 9, 4))
    w = jnp.ones((3, 3, 4, 8))
    assert vops.same_conv(x, w, stride=2).shape == (1, 5, 5, 8)  # ceil(9/2)


def test_conv_transpose_same_doubles_spatial():
    x = jnp.ones((2, 7, 5, 4))
    w = jnp.ones((5, 5, 4, 16)) * 0.01
    y = vops.conv_transpose_same(x, w, stride=2)
    assert y.shape == (2, 14, 10, 16)


def test_conv_transpose_matches_grad_of_conv():
    # conv_transpose(x, w) must be the adjoint of same-stride-2 conv:
    # <conv(a), x> == <a, conv_T(x)> for all a.
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (1, 8, 8, 2))
    w = jax.random.normal(k2, (3, 3, 2, 5))
    x = jax.random.normal(k3, (1, 4, 4, 5))
    lhs = jnp.sum(vops.same_conv(a, w, stride=2) * x)
    # adjoint wrt a, with kernel transposed I<->O and flipped (what
    # lax.conv_transpose(transpose_kernel=False) + HWIO does for us we
    # verify via jax.vjp on the forward conv)
    _, vjp = jax.vjp(lambda t: vops.same_conv(t, w, stride=2), a)
    (adj,) = vjp(x)
    rhs = jnp.sum(a * adj)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_prelu():
    x = jnp.array([[-2.0, 3.0]])
    alpha = jnp.array([0.5, 0.5])
    np.testing.assert_allclose(np.asarray(vops.prelu(x, alpha)), [[-1.0, 3.0]])


def test_leaky_relu():
    x = jnp.array([-10.0, 10.0])
    np.testing.assert_allclose(np.asarray(vops.leaky_relu(x, 0.1)), [-1.0, 10.0])


def test_instance_norm_normalizes_per_sample_channel():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 3)) * 5 + 2
    y = vops.instance_norm(x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    s = np.asarray(jnp.std(y, axis=(1, 2)))
    np.testing.assert_allclose(m, np.zeros_like(m), atol=1e-4)
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-3)


def test_resize_nearest():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
    y = vops.resize_nearest(x, 2)
    expect = np.array([[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(y)[0, :, :, 0], expect)


def test_resize_bilinear_constant_preserved():
    x = jnp.full((1, 4, 4, 3), 0.25)
    y = vops.resize_bilinear(x, 4)
    assert y.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y), 0.25, rtol=1e-6)


def test_safe_atanh_tanh_roundtrip():
    x = jnp.linspace(-0.999, 0.999, 32)
    y = jnp.tanh(vops.safe_atanh(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 0.99999, rtol=1e-4)


def test_center_crop_keras_convention():
    # Keras Cropping2D with odd diff removes extra from bottom/right
    x = jnp.arange(5 * 7, dtype=jnp.float32).reshape(1, 5, 7, 1)
    y = vops.center_crop_to(x, (4, 4))
    assert y.shape == (1, 4, 4, 1)
    # dh=1 -> top crop 0; dw=3 -> left crop 1
    np.testing.assert_array_equal(np.asarray(y)[0, 0, :, 0], [1, 2, 3, 4])


@pytest.mark.parametrize("det", [True, False])
def test_dropout(det):
    key = jax.random.PRNGKey(2)
    x = jnp.ones((4, 8, 8, 2))
    y = vops.dropout(x, 0.5, key, deterministic=det)
    if det:
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    else:
        vals = np.unique(np.asarray(y))
        assert set(np.round(vals, 3)).issubset({0.0, 2.0})
