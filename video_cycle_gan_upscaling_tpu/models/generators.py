"""Generator zoo (Flax linen), parity with the reference model factories.

Every generator is fully convolutional: an NHWC input at LR resolution
produces output at ``LR * upscale_factor`` with tanh range [-1,1]. The
reference's factories (upscaling/upscaler/model.py:267-827) build Keras
graphs at a fixed shape; here shapes are resolved at trace time, so the
same module instance serves 128-pixel training crops and full video tiles
(the reference needed the layers.pop(0) re-instantiation trick instead,
upscaler_mini_testing.ipynb cells 6-7).

Architecture parity map (file:line into /root/reference):
- UpscalerOrig            <- make_upscaler_orig            model.py:267-295
- UpscalerAttention       <- make_upscaler_attention       model.py:299-328
- UpscalerSkipCon         <- make_upscaler_skip_con        model.py:332-363
- UpscalerIncepResnet     <- make_upscaler_incep_resnet    model.py:443-489
- UpscalerUnetish         <- make_upscaler_unetish         model.py:570-636
- UpscalerUnetishAdd      <- make_upscaler_unetish_add     model.py:642-717
- UpscalerUnetishComplex  <- make_upscaler_unetish_complex model.py:743-827
- CycleGanResnetGenerator: the external CycleGAN stage brought in-scope
  (BASELINE.json north star; no reference counterpart in-repo).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_cycle_gan_upscaling_tpu.models.blocks import (
    AttentionResidualBlock,
    AttentionUpsamplingBlock,
    InceptionResblock2Path,
    InceptionResblock3Path,
    Norm,
    PReLU,
    ResidualBlock,
    UnetConvBlock,
    UnetUpBlock,
    UpsamplingBlock,
    conv,
    conv_t,
    crop_merge_add,
    crop_merge_concat,
)
from video_cycle_gan_upscaling_tpu.ops import nn as vops


def _norm_residual(parent, y, skip, kind: str, name: str):
    """Fused norm + residual-add epilogue (param tree matches Norm)."""
    if kind == "instance":
        from video_cycle_gan_upscaling_tpu.models.blocks import _NormParams
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        g, b = _NormParams(y.shape[-1], name=name, parent=parent)()
        return pnorms.instance_norm_residual(y, g, b, skip)
    return skip + Norm(kind, name=name, parent=parent)(y)  # batch/none


def _norm_relu(parent, y, kind: str, name: str):
    """Fused norm + ReLU (CycleGAN generator epilogue)."""
    if kind == "instance":
        from video_cycle_gan_upscaling_tpu.models.blocks import _NormParams
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

        g, b = _NormParams(y.shape[-1], name=name, parent=parent)()
        return pnorms.instance_norm_act(y, g, b, jnp.zeros((1,), jnp.float32),
                                        "relu")
    return jax.nn.relu(Norm(kind, name=name, parent=parent)(y))  # batch/none


def _upscale_times(factor: int) -> int:
    t = int(math.log2(factor))
    if 2 ** t != factor:
        raise ValueError(f"upscale_factor must be a power of 2, got {factor}")
    return t


def _head_conv(parent, y, k: int = 9, name: str = "final_conv"):
    """Final 3-channel conv (pre-tanh), optionally S-blocked via the
    module's ``head_block`` field: evaluated as an S-blocked strided
    conv + depth_to_space (scatter-free einsum prepack, ops/subpixel)
    so the MXU sees 3*S^2 output lanes instead of 3. Same param tree
    (nn.Conv-compatible), same linear map — value/grad equivalence in
    tests/test_generators.py. The round-3 device trace put the 3-lane
    head region at 22 of the GAN step's 52 ms device time; S=4 measured
    88.9 -> 76.5 ms/step at the bench config (docs/PERF.md)."""
    hb = getattr(parent, "head_block", 1)
    if hb > 1 and y.shape[1] % hb == 0 and y.shape[2] % hb == 0:
        from video_cycle_gan_upscaling_tpu.models.blocks import _ConvParams
        from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

        w, b = _ConvParams(k, y.shape[-1], 3, name=name, parent=parent)()
        yp = sp.conv_same_phase_blocked(y, w, b, 1, hb)
        return sp.depth_to_space(yp, hb)
    return conv(3, k, dtype=parent.dtype, name=name)(y)


class UpscalerOrig(nn.Module):
    """SRGAN-style ResNet upscaler (model.py:267-295).

    ``phase_tail=True`` evaluates the whole upsampling tail — transpose
    convs, LeakyReLUs and the final 9x9 conv — on the LR grid in
    phase-packed channel space with one depth_to_space at the end
    (ops/subpixel.py). Bit-compatible params and outputs with the pixel
    path; on TPU it avoids XLA's input-dilation transpose-conv lowering
    and lifts the 3-output-lane final conv to 3*S^2 MXU lanes. Default is
    False because the phase graph's gather/scatter autodiff compiles
    slowly — training graphs keep the pixel tail, inference graphs
    (bench, upscale CLI, entry()) enable it.
    """

    kernel_size: int = 5
    filters: int = 64
    upscale_factor: int = 4
    res_block_num: int = 16
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # default False: the phase graph's gather/scatter autodiff compiles
    # slowly; enable for inference graphs (bench, upscale CLI, entry())
    phase_tail: bool = False
    # cap on the head's extra spatial blocking in the phase tail (None =
    # auto-pick 4/2/1). The blocked-head kernel gather grows ~S^4 and its
    # BACKWARD is a scatter-add, so differentiated phase graphs want a
    # small cap (scripts/microbench_r3h.py); inference keeps the auto pick.
    phase_head_extra: int | None = None
    # W-pair-packed trunk for TRAINING graphs: the 64-channel trunk
    # convs use 64 of 128 MXU lanes; packing W-pairs into channels
    # (free reshape + in-graph einsum-rearranged pair kernels,
    # blocks.ResidualBlockPacked) runs them at full lanes for 1.4x
    # structural taps. Isolated 16-block chain fwd+bwd at the bench
    # training shape: 19.96 -> 5.3 ms net of RPC
    # (scripts/packed_trunk_train_ab.py). Instance norm only; same
    # param tree; False default keeps inference/golden graphs
    # unchanged.
    trunk_pack: bool = False
    # PIXEL-tail head blocking for TRAINING graphs: evaluate the final
    # 9x9 conv as an S-blocked strided conv (3*S^2 MXU output lanes
    # instead of 3) + depth_to_space — same params, same math. The
    # round-3 device trace showed the 3-lane head region is 22 of the
    # GAN step's 52 ms device time at 0.8-3% MFU (its forward+loss
    # fusion alone 14.3 ms); S=4 lifts the lanes 16x. 1 = plain conv
    # (default; inference paths and goldens unchanged), >1 = block when
    # the HR dims divide.
    head_block: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, return_trunk: bool = False):
        """``return_trunk=True`` additionally returns the post-global-skip
        trunk feature (the tail input) — the feature-matching observable
        for student distillation (train/distill.py). Param tree and the
        default return are unchanged."""
        from video_cycle_gan_upscaling_tpu.models.blocks import (
            UpsamplingBlockPhase,
            _ConvParams,
        )
        from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

        x = x.astype(self.dtype)
        y = conv(self.filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        if (self.trunk_pack and self.norm == "instance"
                and y.shape[2] % 2 == 0):
            from video_cycle_gan_upscaling_tpu.models.blocks import (
                ResidualBlockPacked,
                _NormParams,
                _instance_norm_packed,
                packed_pair_conv,
            )

            n_, h_, w_, c_ = y.shape
            yp = y.reshape(n_, h_, w_ // 2, 2 * c_)
            trunk_in_p = yp
            for i in range(self.res_block_num):
                yp = ResidualBlockPacked(self.kernel_size, self.filters,
                                         self.dtype,
                                         name=f"res_block_{i}")(yp)
            wpf, bpf = _ConvParams(self.kernel_size, self.filters,
                                   self.filters, name="prefinal_conv")()
            yp = packed_pair_conv(yp, wpf, bpf, self.dtype)
            gpf, npf = _NormParams(self.filters, name="prefinal_norm")()
            yp = _instance_norm_packed(yp, gpf, npf, skip=trunk_in_p)
            y = yp.reshape(n_, h_, w_, c_).astype(self.dtype)
        else:
            trunk_in = y
            for i in range(self.res_block_num):
                y = ResidualBlock(self.kernel_size, self.filters, self.norm,
                                  self.dtype, name=f"res_block_{i}")(y)
            y = conv(self.filters, self.kernel_size, dtype=self.dtype,
                     name="prefinal_conv")(y)
            y = _norm_residual(self, y, trunk_in, self.norm,
                               "prefinal_norm")
        trunk_feat = y if return_trunk else None
        times = _upscale_times(self.upscale_factor)
        if not self.phase_tail:
            for i in range(times):
                y = UpsamplingBlock(self.kernel_size, 256, self.dtype,
                                    name=f"upscale_{i}")(y)
            y = _head_conv(self, y)
            out = jnp.tanh(y.astype(jnp.float32))
            return (out, trunk_feat) if return_trunk else out

        r = 1
        c_in = self.filters
        for i in range(times):
            y = UpsamplingBlockPhase(self.kernel_size, 256, r, self.dtype,
                                     name=f"upscale_{i}")(y, c_in)
            r *= 2
            c_in = 256
        w9, b9 = _ConvParams(9, c_in, 3, name="final_conv")()
        # extra spatial blocking for MXU output lanes (3*S^2); pick the
        # largest of 4/2/1 dividing the LR tile (capped by phase_head_extra)
        extra = 1
        for e in (4, 2):
            if (self.phase_head_extra is None or e <= self.phase_head_extra) \
                    and y.shape[1] % e == 0 and y.shape[2] % e == 0:
                extra = e
                break
        yp = sp.conv_same_phase_blocked(y, w9, b9, r, extra)
        yp = jnp.tanh(yp.astype(jnp.float32))
        out = sp.depth_to_space(yp, r * extra)
        return (out, trunk_feat) if return_trunk else out


class UpscalerAttention(nn.Module):
    """Attention-gated SRGAN trunk with atanh input re-injection
    (model.py:299-328); the default generator of train_gan.py:42."""

    kernel_size: int = 5
    filters: int = 64
    upscale_factor: int = 4
    res_block_num: int = 16
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # see UpscalerOrig.head_block (S-blocked training head)
    head_block: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = conv(self.filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        trunk_in = y
        for i in range(self.res_block_num):
            y = AttentionResidualBlock(self.kernel_size, self.filters, self.norm,
                                       self.dtype, name=f"res_block_{i}")(y, x)
        y = conv(self.filters, self.kernel_size, dtype=self.dtype, name="after_res_conv")(y)
        y = _norm_residual(self, y, trunk_in, self.norm, "after_res_norm")
        for i in range(_upscale_times(self.upscale_factor)):
            scale = 2 ** (i + 1)
            y = AttentionUpsamplingBlock(scale, self.kernel_size, 128, self.dtype,
                                         name=f"upscale_{i}")(y, x)
        y = _head_conv(self, y)
        return jnp.tanh(y.astype(jnp.float32))


class UpscalerSkipCon(nn.Module):
    """SRGAN trunk + bilinear-resized input concat before the final conv
    (model.py:332-363; 224-ch upsample kept for parity with the reference's
    OOM workaround note at model.py:353). ``phase_tail`` as in UpscalerOrig
    (the resized-input concat happens per phase block)."""

    kernel_size: int = 5
    filters: int = 64
    upscale_factor: int = 4
    res_block_num: int = 16
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # see UpscalerOrig.head_block (S-blocked training head)
    head_block: int = 1
    phase_tail: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from video_cycle_gan_upscaling_tpu.models.blocks import (
            UpsamplingBlockPhase,
            _ConvParams,
        )
        from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

        x = x.astype(self.dtype)
        y = conv(self.filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        trunk_in = y
        for i in range(self.res_block_num):
            y = ResidualBlock(self.kernel_size, self.filters, self.norm,
                              self.dtype, name=f"res_block_{i}")(y)
        y = conv(self.filters, 3, dtype=self.dtype, name="prefinal_conv")(y)
        y = _norm_residual(self, y, trunk_in, self.norm, "prefinal_norm")
        times = _upscale_times(self.upscale_factor)
        resized = vops.resize_bilinear(x, self.upscale_factor)
        if not self.phase_tail:
            for i in range(times):
                y = UpsamplingBlock(3, 224, self.dtype, name=f"upscale_{i}")(y)
            y = jnp.concatenate([resized, y], axis=-1)
            y = _head_conv(self, y)
            return jnp.tanh(y.astype(jnp.float32))

        r = 1
        c_in = self.filters
        for i in range(times):
            y = UpsamplingBlockPhase(3, 224, r, self.dtype,
                                     name=f"upscale_{i}")(y, c_in)
            r *= 2
            c_in = 224
        # per-phase concat of the bilinear-resized input (3ch) with the
        # phase tensor (HR concat == blockwise concat in phase space)
        rp = sp.space_to_depth(resized, r)
        n_, hh, ww, _ = y.shape
        yb = y.reshape(n_, hh, ww, r * r, c_in)
        rb = rp.reshape(n_, hh, ww, r * r, 3)
        y = jnp.concatenate([rb, yb], axis=-1).reshape(n_, hh, ww, -1)
        w9, b9 = _ConvParams(9, 3 + c_in, 3, name="final_conv")()
        extra = 1
        for e in (4, 2):
            if y.shape[1] % e == 0 and y.shape[2] % e == 0:
                extra = e
                break
        yp = sp.conv_same_phase_blocked(y, w9, b9, r, extra)
        yp = jnp.tanh(yp.astype(jnp.float32))
        return sp.depth_to_space(yp, r * extra)


class UpscalerIncepResnet(nn.Module):
    """Inception-ResNet upscaler with three configurable stages
    (model.py:443-489; stage defaults from train_gan2.py:246-251)."""

    filters: int = 64
    upscale_factor: int = 4
    a_block_type: str = "3path"
    a_block_num: int = 5
    a_block_kernel: int = 3
    b_block_type: str = "2path"
    b_block_num: int = 10
    b_block_kernel: int = 7
    c_block_type: str = "2path"
    c_block_num: int = 5
    c_block_kernel: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # see UpscalerOrig.head_block (S-blocked training head)
    head_block: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = conv(self.filters, 9, dtype=self.dtype, name="initial_conv")(x)
        trunk_in = y
        stages = (
            ("A", self.a_block_type, self.a_block_num, self.a_block_kernel),
            ("B", self.b_block_type, self.b_block_num, self.b_block_kernel),
            ("C", self.c_block_type, self.c_block_num, self.c_block_kernel),
        )
        for stage, btype, num, kernel in stages:
            for i in range(num):
                cls = InceptionResblock3Path if btype == "3path" else InceptionResblock2Path
                y = cls(self.filters, kernel, self.norm, self.dtype,
                        name=f"stage_{stage}_{i}")(y)
        y = conv(self.filters, self.c_block_kernel, dtype=self.dtype, name="prefinal_conv")(y)
        y = _norm_residual(self, y, trunk_in, self.norm, "prefinal_norm")
        for i in range(_upscale_times(self.upscale_factor)):
            y = UpsamplingBlock(self.c_block_kernel, 256, self.dtype, name=f"upscale_{i}")(y)
        y = _head_conv(self, y)
        return jnp.tanh(y.astype(jnp.float32))


class _UnetishBase(nn.Module):
    """Shared U-Net-ish machinery (model.py:570-717). Subclasses pick the
    skip-merge (concat vs add) and the output head."""

    kernel_size: int = 5
    upscale_factor: int = 4
    step_size: int = 4
    downscale_times: int = 5
    initial_filters: int = 32
    dropout_rate: float = 0.1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # see UpscalerOrig.head_block (S-blocked training head)
    head_block: int = 1

    def _down_path(self, y, det):
        skips = []
        f = self.initial_filters
        for step in range(self.downscale_times):
            for i in range(self.step_size):
                y = UnetConvBlock(self.kernel_size, f, 1, self.dropout_rate,
                                  self.norm, self.dtype,
                                  name=f"down_{step}_same_{i}")(y, det)
            skips.append(y)
            y = UnetConvBlock(self.kernel_size, f, 2, self.dropout_rate,
                              self.norm, self.dtype, name=f"down_{step}_down")(y, det)
            f *= 2
        for i in range(self.step_size):
            y = UnetConvBlock(self.kernel_size, f, 1, self.dropout_rate,
                              self.norm, self.dtype, name=f"bottom_{i}")(y, det)
        return y, skips, f


class UpscalerUnetish(_UnetishBase):
    """U-Net with concat skips + exact-shape center crop (model.py:570-636)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = x.astype(self.dtype)
        out_h = x.shape[1] * self.upscale_factor
        out_w = x.shape[2] * self.upscale_factor
        y = conv(self.initial_filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        y, skips, f = self._down_path(y, det)
        up_steps = _upscale_times(self.upscale_factor) + self.downscale_times
        for step in range(up_steps):
            y = UnetUpBlock(self.kernel_size, f, self.dropout_rate, self.norm,
                            self.dtype, name=f"up_{step}_up")(y, det)
            if step < len(skips):
                y = crop_merge_concat(skips[len(skips) - step - 1], y)
                f //= 2
            for i in range(self.step_size):
                y = UnetConvBlock(self.kernel_size, f, 1, self.dropout_rate,
                                  self.norm, self.dtype, name=f"up_{step}_same_{i}")(y, det)
        y = _head_conv(self, y)
        y = jnp.tanh(y.astype(jnp.float32))
        return vops.center_crop_to(y, (out_h, out_w))


class UpscalerUnetishAdd(_UnetishBase):
    """U-Net with add skips + atanh bilinear input injection head
    (model.py:642-717)."""

    initial_filters: int = 48

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = x.astype(self.dtype)
        out_h = x.shape[1] * self.upscale_factor
        out_w = x.shape[2] * self.upscale_factor
        y = conv(self.initial_filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        y, skips, f = self._down_path(y, det)
        f //= 2  # model.py:673
        up_steps = _upscale_times(self.upscale_factor) + self.downscale_times
        for step in range(up_steps):
            y = UnetUpBlock(self.kernel_size, f, self.dropout_rate, self.norm,
                            self.dtype, name=f"up_{step}_up")(y, det)
            if step < len(skips):
                y = crop_merge_add(skips[len(skips) - step - 1], y)
                f //= 2
            for i in range(self.step_size):
                y = UnetConvBlock(self.kernel_size, f, 1, self.dropout_rate,
                                  self.norm, self.dtype, name=f"up_{step}_same_{i}")(y, det)
        y = conv(3, 9, dtype=self.dtype, name="prefinal_conv")(y)
        y = jnp.tanh(y.astype(jnp.float32)).astype(self.dtype)
        y = vops.center_crop_to(y, (out_h, out_w))
        resized = vops.resize_bilinear(x, self.upscale_factor)
        resized = vops.safe_atanh(resized.astype(jnp.float32)).astype(self.dtype)
        y = crop_merge_add(y, resized)
        y = _head_conv(self, y)
        return jnp.tanh(y.astype(jnp.float32))


class UpscalerUnetishComplex(_UnetishBase):
    """U-Net + 3-stage iterative attention-refinement head over the
    bilinear-upscaled input (model.py:743-827; dead code in the reference —
    reachable here via generator='unetish-complex')."""

    downscale_times: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        x = x.astype(self.dtype)
        out_h = x.shape[1] * self.upscale_factor
        out_w = x.shape[2] * self.upscale_factor
        y = conv(self.initial_filters, 9, dtype=self.dtype, name="initial_conv")(x)
        y = PReLU(name="initial_prelu")(y)
        y, skips, f = self._down_path(y, det)
        up_steps = _upscale_times(self.upscale_factor) + self.downscale_times
        for step in range(up_steps):
            y = UnetUpBlock(self.kernel_size, f, self.dropout_rate, self.norm,
                            self.dtype, name=f"up_{step}_up")(y, det)
            if step < len(skips):
                y = crop_merge_concat(skips[len(skips) - step - 1], y)
                f //= 2
            for i in range(self.step_size):
                y = UnetConvBlock(self.kernel_size, f, 1, self.dropout_rate,
                                  self.norm, self.dtype, name=f"up_{step}_same_{i}")(y, det)

        resized = vops.resize_bilinear(x, self.upscale_factor)
        y = vops.center_crop_to(y, resized.shape[1:3])
        att = conv(3, 9, dtype=self.dtype, name="att_init")(resized)
        for step in range(3):
            att = jnp.concatenate([resized, att], axis=-1)
            att = conv(3, 9, dtype=self.dtype, name=f"att_{step}_conv")(att)
            att = jax.nn.sigmoid(att)
            y = conv(3, 9, dtype=self.dtype, name=f"head_{step}_conv")(y)
            gated = att * y
            y = jnp.concatenate([gated, y], axis=-1)
            y = conv(3, 9, dtype=self.dtype, name=f"head_{step}_conv_after")(y)
            y = jnp.tanh(y.astype(jnp.float32)).astype(self.dtype)
            if step < 2:
                y = nn.Dropout(self.dropout_rate, deterministic=det,
                               name=f"head_{step}_dropout")(y)
        return vops.center_crop_to(y.astype(jnp.float32), (out_h, out_w))


class CycleGanResnetGenerator(nn.Module):
    """CycleGAN ResNet generator (c7s1-64, d128, d256, N res blocks, u128,
    u64, c7s1-3, tanh) — the external style-transfer stage brought in-scope
    per BASELINE.json; same-resolution, InstanceNorm + ReLU."""

    filters: int = 64
    res_block_num: int = 9
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32
    # see UpscalerOrig.head_block (S-blocked training head)
    head_block: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        y = conv(self.filters, 7, dtype=self.dtype, name="stem")(x)
        y = _norm_relu(self, y, self.norm, "stem_norm")
        f = self.filters
        for i in range(2):
            f *= 2
            y = conv(f, 3, stride=2, dtype=self.dtype, name=f"down_{i}")(y)
            y = _norm_relu(self, y, self.norm, f"down_{i}_norm")
        for i in range(self.res_block_num):
            skip = y
            z = conv(f, 3, dtype=self.dtype, name=f"res_{i}_conv1")(y)
            z = _norm_relu(self, z, self.norm, f"res_{i}_norm1")
            z = conv(f, 3, dtype=self.dtype, name=f"res_{i}_conv2")(z)
            y = _norm_residual(self, z, skip, self.norm, f"res_{i}_norm2")
        for i in range(2):
            f //= 2
            y = conv_t(f, 3, 2, dtype=self.dtype, name=f"up_{i}")(y)
            y = _norm_relu(self, y, self.norm, f"up_{i}_norm")
        y = _head_conv(self, y, k=7, name="head")
        return jnp.tanh(y.astype(jnp.float32))


def make_generator(cfg, upscale_factor: int | None = None, dtype=jnp.float32,
                   phase_tail: bool = False, head_block: int = 1,
                   trunk_pack: bool = False):
    """Factory keyed on ModelConfig.generator (train_gan.py:208-217 parity).
    ``phase_tail`` selects the fast inference tail where supported;
    ``head_block`` the S-blocked training head (_head_conv);
    ``trunk_pack`` the W-pair-packed training trunk (UpscalerOrig)."""
    f = upscale_factor if upscale_factor is not None else 4
    common = dict(norm=cfg.norm, dtype=dtype, head_block=head_block)
    name = cfg.generator
    if name == "orig":
        return UpscalerOrig(cfg.kernel_size, cfg.filters, f, cfg.res_block_num,
                            phase_tail=phase_tail, trunk_pack=trunk_pack,
                            **common)
    if name == "skip-con":
        return UpscalerSkipCon(cfg.kernel_size, cfg.filters, f, cfg.res_block_num,
                               phase_tail=phase_tail, **common)
    if name == "resnet-att":
        return UpscalerAttention(cfg.kernel_size, cfg.filters, f, cfg.res_block_num, **common)
    if name == "inc-resnet":
        return UpscalerIncepResnet(
            cfg.filters, f,
            cfg.a_block_type, cfg.a_block_num, cfg.a_block_kernel,
            cfg.b_block_type, cfg.b_block_num, cfg.b_block_kernel,
            cfg.c_block_type, cfg.c_block_num, cfg.c_block_kernel,
            **common)
    unet_kw = dict(kernel_size=cfg.kernel_size, upscale_factor=f,
                   step_size=cfg.unet_step_size,
                   dropout_rate=cfg.dropout_rate, **common)
    if name == "unetish":
        return UpscalerUnetish(downscale_times=cfg.unet_downscale_times,
                               initial_filters=cfg.unet_initial_filters, **unet_kw)
    if name == "unetish-add":
        return UpscalerUnetishAdd(downscale_times=cfg.unet_downscale_times,
                                  initial_filters=max(cfg.unet_initial_filters, 48),
                                  **unet_kw)
    if name == "unetish-complex":
        return UpscalerUnetishComplex(downscale_times=min(cfg.unet_downscale_times, 3),
                                      initial_filters=cfg.unet_initial_filters, **unet_kw)
    if name == "cyclegan-resnet":
        return CycleGanResnetGenerator(cfg.filters, cfg.res_block_num, **common)
    raise ValueError(f"unknown generator: {name}")
