"""Building blocks for the generator/discriminator zoo (Flax linen).

Functional re-design of the reference block library
(/root/reference/upscaling/upscaler/model.py:15-98, 372-436, 505-566):
same dataflow graphs, but NHWC + InstanceNorm (default) instead of
BatchNorm — InstanceNorm has no cross-batch state, which keeps the fused
jitted GAN step pure and avoids the real/fake-batch statistics hazard the
reference has (SURVEY.md §7 "Hard parts"). ``norm='none'`` is also
supported; all convs accumulate in f32 on the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp


class PReLU(nn.Module):
    """Per-channel PReLU (Keras PReLU shared_axes=[1,2], model.py:21)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return vops.prelu(x, alpha)


class Norm(nn.Module):
    """Switchable normalization epilogue.

    kind='instance': per-(sample,channel) spatial norm with affine params,
    computed by the fused Pallas kernel on TPU (ops/pallas/norms.py —
    XLA's spatial-reduction lowering costs ~4x a 5x5 conv per layer).
    kind='none': identity (reference's batch_norm=False paths).
    """

    kind: str = "instance"

    @nn.compact
    def __call__(self, x):
        if self.kind == "none":
            return x
        if self.kind not in ("instance", "batch"):
            raise ValueError(f"unsupported norm kind: {self.kind}")
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        fn = (pnorms.instance_norm_act if self.kind == "instance"
              else pnorms.batch_norm_act)
        return fn(x, gamma, beta, jnp.zeros((1,), jnp.float32), "none")


def conv(features: int, kernel: int | Tuple[int, int], stride: int = 1,
         padding: str = "SAME", dtype=None, name=None) -> nn.Conv:
    k = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    return nn.Conv(features, k, strides=(stride, stride), padding=padding,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class ConvTransposeSubpixel(nn.Module):
    """Drop-in for nn.ConvTranspose(SAME): identical param tree
    (kernel [k,k,in,out], bias) and outputs, computed as a dense stride-1
    phase conv + depth_to_space (ops/subpixel.py) — XLA's input-dilation
    lowering of transpose convs multiplies mostly-zeros on the MXU."""

    features: int
    kernel_size: int
    stride: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return sp.conv_transpose_d2s(x, w, b, stride=self.stride)


def conv_t(features: int, kernel: int, stride: int, dtype=None, name=None):
    return ConvTransposeSubpixel(features, kernel, stride, dtype=dtype, name=name)


class _NormParams(nn.Module):
    """Affine params with the Norm module's tree (scale/bias)."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return g, b


class _AlphaParams(nn.Module):
    """PReLU alpha param with the PReLU module's tree (alpha)."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param("alpha", nn.initializers.zeros, (self.features,),
                          jnp.float32)


class _TransposeConvParams(nn.Module):
    """Bare kernel/bias params with nn.ConvTranspose-compatible tree."""

    kernel_size: int
    c_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, self.c_in, self.c_out), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.c_out,), jnp.float32)
        return w, b


class _ConvParams(nn.Module):
    """Bare kernel/bias params with nn.Conv-compatible tree."""

    kernel_size: int
    c_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, self.c_in, self.c_out), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.c_out,), jnp.float32)
        return w, b


class UpsamplingBlockPhase(nn.Module):
    """UpsamplingBlock evaluated in phase space: the feature map stays on
    the LR grid with phase-packed channels throughout the upsampling tail.
    Param tree matches UpsamplingBlock exactly (conv_transp/{kernel,bias}),
    so phase and pixel paths share checkpoints."""

    kernel_size: int = 5
    filters: int = 256
    r: int = 1  # incoming phase scale
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p, c_in: int):
        w, b = _TransposeConvParams(self.kernel_size, c_in, self.filters,
                                    name="conv_transp")()
        y = sp.transpose_conv_phase(p.astype(self.dtype), w, b, 2, self.r)
        return vops.leaky_relu(y, 0.2)


class ResidualBlock(nn.Module):
    """conv->norm->PReLU->conv->norm + skip (model.py:15-27).

    With instance norm, the PReLU and the skip-add are folded into the
    fused norm kernels (one HBM pass each instead of two)."""

    kernel_size: int = 5
    filters: int = 64
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        skip = x
        y = conv(self.filters, self.kernel_size, dtype=self.dtype, name="conv_pre")(x)
        if self.norm in ("instance", "batch"):
            g1, b1 = _NormParams(self.filters, name="norm_pre")()
            alpha = _AlphaParams(self.filters, name="prelu")()
            fn = (pnorms.instance_norm_act if self.norm == "instance"
                  else pnorms.batch_norm_act)
            y = fn(y, g1, b1, alpha, "prelu")
        else:
            y = PReLU(name="prelu")(y)
        y = conv(self.filters, self.kernel_size, dtype=self.dtype, name="conv_post")(y)
        if self.norm == "instance":
            g2, b2 = _NormParams(self.filters, name="norm_post")()
            return pnorms.instance_norm_residual(y, g2, b2, skip)
        if self.norm == "batch":
            g2, b2 = _NormParams(self.filters, name="norm_post")()
            return skip + pnorms.batch_norm_act(
                y, g2, b2, jnp.zeros((1,), jnp.float32), "none")
        return skip + y


class AttentionResidualBlock(nn.Module):
    """Residual block gated by a sigmoid attention mask computed from the
    *network input* (model.py:30-48)."""

    kernel_size: int = 5
    filters: int = 64
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, net_input):
        skip = x
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        att = conv(self.filters, self.kernel_size, dtype=self.dtype, name="attention")(net_input)
        att = jax.nn.sigmoid(att)
        y = att * x
        y = conv(self.filters, self.kernel_size, dtype=self.dtype, name="conv_pre")(y)
        if self.norm in ("instance", "batch"):
            g1, b1 = _NormParams(self.filters, name="norm_pre")()
            alpha = _AlphaParams(self.filters, name="prelu")()
            fn = (pnorms.instance_norm_act if self.norm == "instance"
                  else pnorms.batch_norm_act)
            y = fn(y, g1, b1, alpha, "prelu")
        else:
            y = PReLU(name="prelu")(y)
        y = conv(self.filters, self.kernel_size, dtype=self.dtype, name="conv_post")(y)
        if self.norm == "instance":
            g2, b2 = _NormParams(self.filters, name="norm_post")()
            return pnorms.instance_norm_residual(y, g2, b2, skip)
        if self.norm == "batch":
            g2, b2 = _NormParams(self.filters, name="norm_post")()
            return skip + pnorms.batch_norm_act(
                y, g2, b2, jnp.zeros((1,), jnp.float32), "none")
        return skip + y


class UpsamplingBlock(nn.Module):
    """ConvTranspose(stride 2) + LeakyReLU(0.2) (model.py:70-75)."""

    kernel_size: int = 5
    filters: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = conv_t(self.filters, self.kernel_size, 2, dtype=self.dtype, name="conv_transp")(x)
        return vops.leaky_relu(y, 0.2)


class AttentionUpsamplingBlock(nn.Module):
    """Attention-gated upsampler with atanh-linearized input injection
    (model.py:78-98). ``scale`` is the cumulative upscale after this block;
    the incoming feature map sits at scale//2 of the network input.
    """

    scale: int
    kernel_size: int = 5
    filters: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, net_input):
        half = self.scale // 2
        up_nearest = vops.resize_nearest(net_input, half) if half > 1 else net_input
        up_bilinear = vops.resize_bilinear(net_input, half) if half > 1 else net_input
        up = jnp.concatenate([up_nearest, up_bilinear], axis=-1)

        att = conv(x.shape[-1], self.kernel_size, dtype=self.dtype, name="attention")(up)
        att = jax.nn.sigmoid(att)
        y = att * x
        y = conv_t(self.filters, self.kernel_size, 2, dtype=self.dtype, name="conv_transp")(y)
        y = vops.leaky_relu(y, 0.2)

        inj = vops.safe_atanh(net_input.astype(jnp.float32)).astype(self.dtype)
        inj = conv_t(self.filters, self.scale + 1, self.scale, dtype=self.dtype,
                     name="to_add_input_conv_transp")(inj)
        return y + inj


class InceptionMiniBlock(nn.Module):
    """Pre-activation unit: [norm]->PReLU->conv(k) (model.py:372-381)."""

    filters: int
    kernel: Tuple[int, int]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        if self.norm in ("instance", "batch"):
            g, b = _NormParams(x.shape[-1], name="norm")()
            alpha = _AlphaParams(x.shape[-1], name="prelu")()
            fn = (pnorms.instance_norm_act if self.norm == "instance"
                  else pnorms.batch_norm_act)
            y = fn(x, g, b, alpha, "prelu")
        else:
            y = PReLU(name="prelu")(x)
        return conv(self.filters, self.kernel, dtype=self.dtype, name="conv")(y)


class InceptionResblock3Path(nn.Module):
    """1x1 | 1x1+kxk | 1x1+kxk+kxk paths -> concat -> 1x1 -> +skip
    (model.py:386-411, incl. the 0.5/0.75/1.0 filter fractions)."""

    filters: int = 64
    kernel_size: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.filters
        k = self.kernel_size
        a = InceptionMiniBlock(int(f * 0.5), (1, 1), self.norm, self.dtype, name="a1")(x)
        b = InceptionMiniBlock(int(f * 0.5), (1, 1), self.norm, self.dtype, name="b1")(x)
        b = InceptionMiniBlock(int(f * 0.5), (k, k), self.norm, self.dtype, name="b2")(b)
        c = InceptionMiniBlock(int(f * 0.5), (1, 1), self.norm, self.dtype, name="c1")(x)
        c = InceptionMiniBlock(int(f * 0.75), (k, k), self.norm, self.dtype, name="c2")(c)
        c = InceptionMiniBlock(f, (k, k), self.norm, self.dtype, name="c3")(c)
        y = jnp.concatenate([a, b, c], axis=-1)
        y = conv(f, 1, dtype=self.dtype, name="project")(y)
        return x + y


class InceptionResblock2Path(nn.Module):
    """1x1 | 1x1->1xk->kx1 factorized paths -> concat -> 1x1 -> +skip
    (model.py:416-436, filter fractions 0.5/0.3/0.4/0.5)."""

    filters: int = 64
    kernel_size: int = 7
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.filters
        k = self.kernel_size
        a = InceptionMiniBlock(int(f * 0.5), (1, 1), self.norm, self.dtype, name="a1")(x)
        b = InceptionMiniBlock(int(f * 0.3), (1, 1), self.norm, self.dtype, name="b1")(x)
        b = InceptionMiniBlock(int(f * 0.4), (1, k), self.norm, self.dtype, name="b2")(b)
        b = InceptionMiniBlock(int(f * 0.5), (k, 1), self.norm, self.dtype, name="b3")(b)
        y = jnp.concatenate([a, b], axis=-1)
        y = conv(f, 1, dtype=self.dtype, name="project")(y)
        return x + y


class UnetConvBlock(nn.Module):
    """conv(stride s)->norm->PReLU->Dropout (model.py:505-521). Covers both
    the same-size (s=1) and downsampling (s=2) U-Net-ish blocks."""

    kernel_size: int
    filters: int
    stride: int = 1
    dropout_rate: float = 0.1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        y = conv(self.filters, self.kernel_size, self.stride, dtype=self.dtype, name="conv")(x)
        if self.norm in ("instance", "batch"):
            g, b = _NormParams(self.filters, name="norm")()
            alpha = _AlphaParams(self.filters, name="prelu")()
            fn = (pnorms.instance_norm_act if self.norm == "instance"
                  else pnorms.batch_norm_act)
            y = fn(y, g, b, alpha, "prelu")
        else:
            y = PReLU(name="prelu")(y)
        return nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)


class UnetUpBlock(nn.Module):
    """ConvTranspose(stride 2)->norm->PReLU->Dropout (model.py:523-530)."""

    kernel_size: int
    filters: int
    dropout_rate: float = 0.1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        y = conv_t(self.filters, self.kernel_size, 2, dtype=self.dtype, name="conv_t")(x)
        if self.norm in ("instance", "batch"):
            g, b = _NormParams(self.filters, name="norm")()
            alpha = _AlphaParams(self.filters, name="prelu")()
            fn = (pnorms.instance_norm_act if self.norm == "instance"
                  else pnorms.batch_norm_act)
            y = fn(y, g, b, alpha, "prelu")
        else:
            y = PReLU(name="prelu")(y)
        return nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)


def crop_merge_concat(down: jax.Array, up: jax.Array) -> jax.Array:
    """Center-crop ``up`` to ``down``'s spatial shape, then concat on C
    (concatenate_layers, model.py:549-556). Shapes are static under jit, so
    this is plain Python arithmetic — no throwaway-model shape probing."""
    up = vops.center_crop_to(up, down.shape[1:3])
    return jnp.concatenate([down, up], axis=-1)


def crop_merge_add(down: jax.Array, up: jax.Array) -> jax.Array:
    """Center-crop ``up`` to ``down`` and add (sum_layers, model.py:559-566)."""
    return down + vops.center_crop_to(up, down.shape[1:3])


def _instance_norm_packed(y, gamma, beta, alpha=None, skip=None,
                          eps: float = 1e-5):
    """Instance norm on a W-pair-packed stream [N,H,W/2,2C]: stats fold
    the two W-slots of each channel — EXACTLY the per-(N,C) HR-grid
    statistics (the packing is a spatial reshape). Optional fused PReLU
    (``alpha``) or residual add (``skip``), mirroring the Pallas
    instance_norm_act / instance_norm_residual epilogues the canonical
    ResidualBlock uses. XLA-level: at training-crop scale the reduce is
    bandwidth-trivial, and the conv lane win (ResidualBlockPacked) is
    where the time goes."""
    import jax

    n, h, w2, c2 = y.shape
    c = c2 // 2
    yy = y.astype(jnp.float32).reshape(n, h, w2, 2, c)
    m = yy.mean((1, 2, 3), keepdims=True)
    v = ((yy - m) ** 2).mean((1, 2, 3), keepdims=True)
    z = ((yy - m) * jax.lax.rsqrt(v + eps) * gamma + beta
         ).reshape(n, h, w2, c2)
    if alpha is not None:
        a2 = jnp.tile(alpha, 2)
        z = jnp.where(z >= 0.0, z, a2 * z)
    if skip is not None:
        z = z + skip.astype(jnp.float32)
    return z


def packed_pair_conv(z, w, b, dtype):
    """SAME conv on a W-pair-packed stream [N,H,W/2,2C] via the
    in-graph einsum-rearranged pair kernel (full 128 MXU lanes at 1.4x
    structural taps; differentiable — the rearrangement is a one-hot
    einsum, ops/subpixel)."""
    from jax import lax

    wk, py, px = sp.rearrange_same_kernel_axes(w, 1, 2)
    out = lax.conv_general_dilated(
        z.astype(dtype), wk.astype(dtype), (1, 1), (py, px),
        dimension_numbers=sp.CONV_DIMS)
    return out + jnp.tile(b, 2).astype(out.dtype)


class ResidualBlockPacked(nn.Module):
    """ResidualBlock evaluated on a W-pair-packed stream [N,H,W/2,2C]
    (UpscalerOrig ``trunk_pack``, TRAINING graphs): the convs run the
    in-graph einsum-rearranged pair kernel — full 128 MXU contraction/
    output lanes at 1.4x structural taps instead of 64 lanes — and the
    instance-norm/PReLU/residual epilogues run packed-stats XLA forms.
    Param tree identical to ResidualBlock (same names, shapes, init),
    so checkpoints are interchangeable. Isolated A/B at the bench
    training shape (scripts/packed_trunk_train_ab.py, 16-block chain
    fwd+bwd b8 64x64): 19.96 -> 5.3 ms net of RPC (~3.8x).
    Instance norm only (the trainers' default)."""

    kernel_size: int = 5
    filters: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        f = self.filters
        w1, b1 = _ConvParams(self.kernel_size, f, f, name="conv_pre")()
        g1, n1 = _NormParams(f, name="norm_pre")()
        alpha = _AlphaParams(f, name="prelu")()
        w2, b2 = _ConvParams(self.kernel_size, f, f, name="conv_post")()
        g2, n2 = _NormParams(f, name="norm_post")()

        y = packed_pair_conv(xp, w1, b1, self.dtype)
        y = _instance_norm_packed(y, g1, n1, alpha=alpha
                                  ).astype(self.dtype)
        y = packed_pair_conv(y, w2, b2, self.dtype)
        return _instance_norm_packed(y, g2, n2, skip=xp
                                     ).astype(self.dtype)
