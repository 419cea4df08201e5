"""Discriminator zoo (Flax linen).

Parity with the reference's global discriminators (conv pyramid -> Flatten
-> Dense head -> scalar; /root/reference/upscaling/upscaler/model.py:836-1012)
plus the PatchGAN discriminator the north star adds for CycleGAN training.
LeakyReLU slope 0.1 and the output-activation registry
{none, sigmoid, log-sigm, tanh, bi-log} match model.py:885-892.
InstanceNorm replaces BatchNorm (SURVEY.md §7 divergence note); the first
block has no norm (standard GAN practice — the reference normed its first
block, which with InstanceNorm would erase per-image brightness).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from video_cycle_gan_upscaling_tpu.models.blocks import Norm, _NormParams, conv
from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

_SLOPE01 = jnp.full((1,), 0.1, jnp.float32)
_SLOPE02 = jnp.full((1,), 0.2, jnp.float32)


def _norm_leaky(parent, y, kind: str, name: str, slope):
    """Fused norm + LeakyReLU epilogue (param tree matches Norm)."""
    if kind in ("instance", "batch"):
        g, b = _NormParams(y.shape[-1], name=name, parent=parent)()
        fn = (pnorms.instance_norm_act if kind == "instance"
              else pnorms.batch_norm_act)
        return fn(y, g, b, slope, "leaky")
    return vops.leaky_relu(Norm(kind, name=name, parent=parent)(y),
                           float(slope[0]))


def output_activation(x, kind: str):
    """Final scalar activation registry (model.py:885-892, 166-181)."""
    if kind in ("none", None, "linear"):
        return x
    if kind == "sigmoid":
        return jnp.reciprocal(1.0 + jnp.exp(-x))
    if kind in ("log-sigm", "log"):
        return -jnp.logaddexp(0.0, -x)  # log(sigmoid(x)), numerically stable
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "bi-log":
        ax = jnp.abs(x)
        return (x / (1.0 + ax)) * jnp.log(ax + 2.0)
    raise ValueError(f"unknown activation: {kind}")


class _ConvPyramidDisc(nn.Module):
    """Shared conv-pyramid + dense-head skeleton for the 512-input
    discriminators; blocks = (filters, kernel, stride) tuples."""

    blocks: Sequence[Tuple[int, int, int]] = ()
    dense: Sequence[int] = (1024, 32)
    padding: str = "SAME"
    activation: str = "none"
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.astype(self.dtype)
        for i, (f, k, s) in enumerate(self.blocks):
            y = conv(f, k, stride=s, padding=self.padding, dtype=self.dtype,
                     name=f"block_{i + 1}_conv")(y)
            if i > 0:
                y = _norm_leaky(self, y, self.norm, f"block_{i + 1}_norm", _SLOPE01)
            else:
                y = vops.leaky_relu(y, 0.1)
        y = y.reshape((y.shape[0], -1))
        for j, width in enumerate(self.dense):
            y = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"dense_{j + 1}")(y)
            y = vops.leaky_relu(y, 0.1)
        y = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="dense_out")(y)
        return output_activation(y.astype(jnp.float32), self.activation)


class DiscriminatorSimple512(_ConvPyramidDisc):
    """9 conv blocks 64->512ch, stride-2 from block 2, Dense 1024/32/1
    (model.py:836-896)."""

    blocks: Sequence[Tuple[int, int, int]] = (
        (64, 3, 1), (128, 3, 2), (256, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    )
    dense: Sequence[int] = (1024, 32)


class DiscriminatorThin512(_ConvPyramidDisc):
    """Same depth, 128ch throughout (model.py:901-961)."""

    blocks: Sequence[Tuple[int, int, int]] = (
        (64, 3, 1), (128, 3, 2), (128, 3, 2), (128, 3, 2), (128, 3, 2),
        (128, 3, 2), (128, 3, 2), (128, 3, 2), (128, 3, 2),
    )
    dense: Sequence[int] = (1024, 32)


class DiscriminatorSparse512(_ConvPyramidDisc):
    """6 valid-padding 5x5 stride-3 blocks, Dense 128/32/1
    (model.py:964-1012)."""

    blocks: Sequence[Tuple[int, int, int]] = (
        (64, 5, 1), (128, 5, 3), (256, 5, 3), (256, 5, 3), (256, 5, 3), (256, 5, 3),
    )
    dense: Sequence[int] = (128, 32)
    padding: str = "VALID"


class PatchGanDiscriminator(nn.Module):
    """70x70 PatchGAN (C64-C128-C256-C512 -> 1-ch map). Per-patch logits
    keep the discriminator fully convolutional — resolution-agnostic and
    MXU-friendly (no giant Flatten->Dense). North-star addition for
    CycleGAN; no reference counterpart."""

    base_filters: int = 64
    n_layers: int = 3
    activation: str = "none"
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.astype(self.dtype)
        f = self.base_filters
        y = conv(f, 4, stride=2, dtype=self.dtype, name="block_1_conv")(y)
        y = vops.leaky_relu(y, 0.2)
        for i in range(1, self.n_layers):
            f = min(f * 2, 512)
            y = conv(f, 4, stride=2, dtype=self.dtype, name=f"block_{i + 1}_conv")(y)
            y = _norm_leaky(self, y, self.norm, f"block_{i + 1}_norm", _SLOPE02)
        f = min(f * 2, 512)
        y = conv(f, 4, stride=1, dtype=self.dtype, name="penult_conv")(y)
        y = _norm_leaky(self, y, self.norm, "penult_norm", _SLOPE02)
        y = conv(1, 4, stride=1, dtype=self.dtype, name="head_conv")(y)
        return output_activation(y.astype(jnp.float32), self.activation)


def make_discriminator(cfg, dtype=jnp.float32):
    """Factory keyed on ModelConfig.discriminator (train_gan.py:224-225,
    train_gan3.py:256-262 parity; aliases s512/t512/sp512 accepted)."""
    name = cfg.discriminator
    kw = dict(activation=cfg.discriminator_activation, norm=cfg.norm, dtype=dtype)
    if name in ("simple-512", "s512"):
        return DiscriminatorSimple512(**kw)
    if name in ("thin-512", "t512"):
        return DiscriminatorThin512(**kw)
    if name in ("sparse-512", "sp512"):
        return DiscriminatorSparse512(**kw)
    if name == "patchgan":
        return PatchGanDiscriminator(**kw)
    raise ValueError(f"unknown discriminator: {name}")
