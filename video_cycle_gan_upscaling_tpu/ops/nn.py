"""Core NHWC tensor primitives for the model zoo.

Pure functions over explicit arrays — no module system. All convs route
through XLA's conv_general_dilated so the MXU does the FLOPs; norms and
activations are elementwise epilogues XLA fuses into the conv (the Pallas
variants in ops/pallas/ are used by the hot inference path).

Layer semantics mirror the reference blocks (upscaling/upscaler/model.py:
PReLU shared over H,W = per-channel alpha, model.py:21; LeakyReLU slopes
0.1/0.2; Conv2DTranspose stride-2 "same" upsampling, model.py:70-75), with
InstanceNorm as the default norm (intentional divergence from the
reference's BatchNorm — documented in SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels.
CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def same_conv(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
              stride: int = 1, padding: str = "SAME") -> jax.Array:
    """2-D conv, NHWC x HWIO -> NHWC, optional bias. f32 accumulation."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=CONV_DIMS,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose_same(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                        stride: int = 2) -> jax.Array:
    """Transposed conv with Keras Conv2DTranspose(padding='same') semantics:
    output spatial = input spatial * stride (model.py:72 parity).

    Implemented as input dilation + conv so XLA lowers it onto the MXU.
    """
    y = lax.conv_transpose(
        x, w.astype(x.dtype),
        strides=(stride, stride),
        padding="SAME",
        dimension_numbers=CONV_DIMS,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with per-channel alpha (Keras shared_axes=[1,2], model.py:21)."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, jnp.asarray(slope, x.dtype) * x)


def instance_norm(x: jax.Array, gamma: jax.Array | None = None,
                  beta: jax.Array | None = None, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm over H,W per (sample, channel). Stats in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_inference(x: jax.Array, mean: jax.Array, var: jax.Array,
                         gamma: jax.Array, beta: jax.Array,
                         eps: float = 1e-3) -> jax.Array:
    """BatchNorm with fixed statistics (Keras default eps=1e-3)."""
    scale = (gamma * lax.rsqrt(var + eps)).astype(x.dtype)
    shift = (beta - mean * gamma * lax.rsqrt(var + eps)).astype(x.dtype)
    return x * scale + shift


def resize_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor integer upscale of NHWC (K.resize_images parity)."""
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return y.reshape(n, h * scale, w * scale, c)


def resize_bilinear(x: jax.Array, scale: int) -> jax.Array:
    """Bilinear integer upscale of NHWC.

    Uses half-pixel-centered linear resize (jax.image 'linear'), the TPU-
    friendly formulation; TF1's resize_images(align_corners=False) matches.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * scale, w * scale, c), method="linear").astype(x.dtype)


def safe_atanh(x: jax.Array, squeeze: float = 0.99999) -> jax.Array:
    """atanh(squeeze * x) — the reference's tanh-linearizing input injection
    (model.py:93, model.py:708)."""
    return jnp.arctanh(jnp.asarray(squeeze, x.dtype) * x)


def center_crop_to(x: jax.Array, target_hw: Sequence[int]) -> jax.Array:
    """Center-crop NHWC to (H, W) with Keras Cropping2D split convention:
    extra odd pixel removed from the bottom/right (model.py:627-630)."""
    th, tw = target_hw
    dh, dw = x.shape[1] - th, x.shape[2] - tw
    top, left = dh // 2, dw // 2
    return x[:, top:top + th, left:left + tw, :]


def dropout(x: jax.Array, rate: float, key: jax.Array | None,
            deterministic: bool) -> jax.Array:
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))
