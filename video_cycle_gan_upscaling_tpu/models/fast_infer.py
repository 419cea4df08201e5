"""Fused-kernel inference runner for the flagship UpscalerOrig.

Same outputs as ``UpscalerOrig.apply`` (phase_tail semantics), rebuilt for
inference speed of light (VERDICT.md round-1 items 2-3):

- the whole 16-block trunk runs W-packed at 128 lanes through the fused
  conv+instance-norm Pallas kernel (ops/pallas/fused_conv.py): one kernel
  per conv, with the previous layer's norm apply / PReLU / residual add
  fused in as a VMEM pre-op — a norm never touches HBM as its own pass;
- trunk conv biases are dropped (per-channel bias cancels in instance
  norm — ops/quant.py invariance note);
- every phase-space tail kernel (transpose convs + final 9x9) is
  rearranged ONCE at prepack time instead of gather-rebuilt inside every
  jitted forward; single-upsample tails run x-packed (free W-pair channel
  fold to full MXU K-lanes, then the 9x9 head as a stride-(2,2) S=(4,8)
  conv straight on that layout — ops/head_conv.py, layout A/Bs in
  docs/PERF.md round 2);
- ``quant=True`` runs the trunk convs W8A8 on the MXU (v5e ~2x bf16
  peak) with in-VMEM activation quantization: the residual stream stays
  bf16 (more accurate than the round-1 turbo's int8 ring), and no int8
  tensor crosses an HBM kernel boundary in the trunk (the round-1
  relayout tax, docs/PERF.md); after ``calibrate()`` the tail also runs
  W8A8 on the same x-packed structure.

Reference semantics: make_upscaler_orig
(/root/reference/upscaling/upscaler/model.py:267-295).
"""

from __future__ import annotations

import math

import numpy as np
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
from video_cycle_gan_upscaling_tpu.ops import head_conv
from video_cycle_gan_upscaling_tpu.ops.pallas import fused_conv as fc
from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms
from video_cycle_gan_upscaling_tpu.ops.pallas import up_conv as upc
from video_cycle_gan_upscaling_tpu.ops.quant import QSCALE

# int8 clip scale for the residual-stream convs (conv_pre inputs): the
# trunk stream grows ~sqrt(depth), so give it the round-1 RSCALE range.
RES_QSCALE = 127.0 / 16.0


class FastOrigRunner:
    """Prepacked UpscalerOrig inference: runner = FastOrigRunner(params,...);
    y = jax.jit(runner.apply)(runner.qp, x). ``qp`` is a pure array pytree
    (safe to device_put / donate); all shape plans are static attributes.
    """

    def __init__(self, params: Dict[str, Any], *, res_block_num: int = 16,
                 upscale_factor: int = 4, tile_hw: Tuple[int, int],
                 filters: Optional[int] = None, quant=False,
                 dtype=jnp.bfloat16, stats_mode: Optional[str] = None):
        """``quant``: False = bf16 everywhere; True = W8A8 trunk AND
        (after calibrate()) W8A8 tail; "tail" = bf16 trunk + W8A8 tail —
        the tail contributes far less quantization error than the trunk
        (docs/PERF.md round-3 isolation), so tail-only turbo is the
        fastest mode that can clear the ≤0.1 dB budget gate."""
        assert quant in (False, True, "tail"), quant
        self.stats_mode = stats_mode  # None -> fused_conv env default
        c = filters or params["initial_conv"]["kernel"].shape[-1]
        self.filters = c
        self.res_block_num = res_block_num
        self.quant = quant is True          # trunk quantization
        self.tail_quant = quant in (True, "tail")
        quant = self.quant
        self.dtype = dtype
        self.times = int(math.log2(upscale_factor))
        assert 2 ** self.times == upscale_factor

        # --- packing geometry (static, from the tile shape) --------------
        h, w = tile_hw
        pack = max(1, 128 // c)
        while pack > 1 and w % pack:
            pack //= 2
        self.pack = pack
        self.cp = c * pack

        qp: Dict[str, Any] = {
            "stem_w": params["initial_conv"]["kernel"].astype(dtype),
            "stem_b": params["initial_conv"]["bias"],
            "stem_alpha": params["initial_prelu"]["alpha"],
        }
        self.pads: Dict[str, Tuple[int, int]] = {}

        def pack_w(tag, kern):
            mat, pads = fc.pack_conv_kernel(kern, pack, quant=quant)
            qp[tag] = mat
            self.pads[tag] = pads

        def tile_c(v):
            return jnp.tile(v.astype(jnp.float32), pack)

        for i in range(res_block_num):
            blk = params[f"res_block_{i}"]
            pack_w(f"w_pre_{i}", blk["conv_pre"]["kernel"])
            pack_w(f"w_post_{i}", blk["conv_post"]["kernel"])
            qp[f"g1_{i}"] = blk["norm_pre"]["scale"].astype(jnp.float32)
            qp[f"b1_{i}"] = blk["norm_pre"]["bias"].astype(jnp.float32)
            qp[f"alpha_{i}"] = tile_c(blk["prelu"]["alpha"])
            qp[f"g2_{i}"] = blk["norm_post"]["scale"].astype(jnp.float32)
            qp[f"b2_{i}"] = blk["norm_post"]["bias"].astype(jnp.float32)
        pack_w("w_prefinal", params["prefinal_conv"]["kernel"])
        qp["g_pf"] = params["prefinal_norm"]["scale"].astype(jnp.float32)
        qp["b_pf"] = params["prefinal_norm"]["bias"].astype(jnp.float32)

        # --- prepacked phase tail ----------------------------------------
        # block0=2 runs the first transpose conv on a space_to_depth'd
        # input: K lanes 64 -> 256 on the MXU and the output lands directly
        # in the final conv's blocked layout (no GB-scale space_to_depth of
        # the 256-channel HR tensor). Restricted to one-upsample tails; the
        # padded-tap overhead of blocking grows quadratically with r, so
        # deeper tails keep the r=1 start.
        self.block0 = 2 if (self.times == 1 and h % 2 == 0 and w % 2 == 0) \
            else 1
        gh, gw = h // self.block0, w // self.block0  # tail grid
        w9 = params["final_conv"]["kernel"]
        r = self.block0 * (2 ** self.times)
        self.final_mode = "square"
        extra = 1
        import os as _os

        # asymmetric S=(r,2r) head: folds a free W-pair reshape into the
        # final conv (output lanes 48->96 of 128 for r=4). Measured on v5e
        # (scripts A/B): NEUTRAL at batch 8 and a 2x REGRESSION at batch 4
        # (XLA mishandles the K=8192 [3,2] conv there), so default OFF;
        # VCGU_ASYM_HEAD=1 re-enables for experiments.
        asym_ok = _os.environ.get("VCGU_ASYM_HEAD", "0") == "1"
        if self.block0 == 2 and (gw % 2 == 0) and asym_ok:
            self.final_mode = "asym"
        elif self.block0 == 1:
            for e in (4, 2):
                if gh % e == 0 and gw % e == 0:
                    extra = e
                    break
        self.extra = extra
        qp["final_b"] = params["final_conv"]["bias"]

        # x-packed tail (the shipped fast path, bf16 AND int8): W-pairs of
        # the r=1 canonical trunk output fold into channels by a free
        # reshape (full 128 K-lanes at 1.33x FLOP padding vs 5.8x for the
        # r=2-blocked transpose kernel), and the 9x9 head runs in the
        # stride-(2,2) S=(4,8) form straight on that layout (96 of 128
        # output lanes, zero relayouts — ops/head_conv.py; layout A/Bs in
        # docs/PERF.md). The r-blocked path below serves the remaining
        # configs (multi-upsample tails, odd tiles, the asym experiment).
        self.xpack_ready = (self.times == 1 and self.final_mode == "square"
                            and extra == 1 and h % 2 == 0 and w % 4 == 0)
        self.up_plans = []
        self.up_fused_ok = False
        if self.xpack_ready:
            up = params["upscale_0"]["conv_transp"]
            qp["up_b_0"] = up["bias"]
            c_up = up["kernel"].shape[-1]
            wp_k, (q_y, q_x), (n_y, n_x) = sp._rearrange_transpose_kernel(
                up["kernel"].astype(jnp.float32), 2)
            # fused Pallas up conv (ops/pallas/up_conv.py) runs the
            # UNPACKED [n_y,n_x,C,4C'] phase kernel directly (K = n_x*C
            # per row tap — 2/3 of the W-pair-packed form's contraction
            # work); requires the 5x5/s2 family's (1,1) row pads
            self.up_fused_ok = (n_y == 3 and q_y == 1)
            wd, self.final_px_q = head_conv.prepack_head_s48(
                w9.astype(jnp.float32), c_up)
            qp["head_w_x"] = wd.astype(dtype)
            if self.up_fused_ok:
                self.up_px = (q_x, n_x - 1 - q_x)
                wmat = wp_k.reshape(n_y, n_x * wp_k.shape[2], 4 * c_up)
                qp["up_w_p"] = wmat.astype(dtype)
                if self.tail_quant:
                    qp["up_w_f32"] = wmat
            else:
                wk1, pads_y1, pads_x1 = sp.rearrange_same_kernel_axes(
                    wp_k, 1, 2, P_y=q_y, P_x=q_x)
                self.up_pads_q = (pads_y1, pads_x1)
                qp["up_w_x"] = wk1.astype(dtype)
        else:
            rr = self.block0
            for i in range(self.times):
                up = params[f"upscale_{i}"]["conv_transp"]
                wk, plan = sp.prepack_transpose_phase(up["kernel"], 2, rr)
                qp[f"up_w_{i}"] = wk.astype(dtype)
                qp[f"up_b_{i}"] = up["bias"]
                self.up_plans.append(plan)
                rr *= 2
            if self.final_mode == "asym":
                # The W-pair lane order ((wx, ay, bx, c)) vs the canonical
                # (r, 2r) order ((ay, r*wx+bx, c)) is a pure channel
                # permutation, folded into the kernel's input axis.
                c_up = w9.shape[-2]
                wk, pads_y, pads_x = sp.rearrange_same_kernel_axes(
                    w9, r, 2 * r)
                j = np.arange(2 * r * r * c_up)
                wx, rem = j // (r * r * c_up), j % (r * r * c_up)
                ay, rem = rem // (r * c_up), rem % (r * c_up)
                bx, c_ = rem // c_up, rem % c_up
                k = (ay * (2 * r) + r * wx + bx) * c_up + c_
                wk = wk[:, :, k, :]
                qp["final_w"] = wk.astype(dtype)
                self.final_pads = (pads_y, pads_x)
            else:
                wk, plan = sp.prepack_same_phase_blocked(w9, r, extra)
                qp["final_w"] = wk.astype(dtype)
                self.final_plan = plan

        # --- int8 tail (quant mode, after calibrate()) --------------------
        # The tail convs are the post-trunk bottleneck; W8A8 doubles their
        # MXU rate on the same x-packed structure as the bf16 tail, and
        # the big phase intermediate becomes int8 (half HBM).
        # Weights: symmetric per-out-channel scales on the prepacked phase
        # kernels. Activations: per-tensor scales measured by calibrate()
        # on a real frame; until calibrated the tail runs the bf16 x-pack.
        self.tail_quant_ready = False
        self.tail_calibrated = False
        if self.tail_quant and self.xpack_ready and self.up_fused_ok:
            # f32 masters for calibrate(): per-CHANNEL activation scales
            # fold into the weights' input axes there, so the int8
            # kernels are re-quantized from full-precision parameters.
            # (up_w_f32 stored above.)
            qp["head_w_f32"] = wd
            # NOTE: tail_s0/tail_s1 (and up_w_q/final_w_q) appear only
            # via calibrate() — tail selection keys on the qp pytree
            # STRUCTURE, so jit retraces when (and only when) a
            # calibrated qp is passed; a stale or discarded-return qp
            # safely keeps the bf16 tail instead of dividing by a zero
            # scale.
            self.tail_quant_ready = True
        self.qp = qp

    # -------------------------------------------------------- calibration
    def calibrate(self, qp: Dict[str, Any], x: jax.Array) -> Dict[str, Any]:
        """Measure int8-tail activation scales on a sample batch (quant
        mode). Returns qp with tail_s0/tail_s1 ADDED; idempotent
        otherwise. Only the returned qp (whose pytree structure now
        differs) runs the W8A8 tail — passing a stale qp, or reusing a
        jit traced before calibration, safely keeps the bf16 tail.

        May be wrapped in jax.jit (pure array function today); callers
        should prefer calling it plain — internals are jitted."""
        if not self.tail_quant_ready:
            return qp
        qp = jax.jit(self._calibrate_tail)(qp, x)
        self.tail_calibrated = True
        return qp

    def _calibrate_tail(self, qp: Dict[str, Any], x: jax.Array):
        """Per-CHANNEL activation scales, measured on the sample batch and
        folded into the weights' input axes before re-quantizing them
        per-out-channel — so channel-calibrated quantization costs zero
        extra runtime ops (the dequant stays one per-out-channel multiply).
        Round-2's per-TENSOR scales measured 37.3 dB vs bf16; the channel
        fold recovers the spread between channel dynamic ranges."""
        trunk = self.apply_trunk(qp, self.apply_stem(qp, x))
        n, h, wp_, cp = trunk.shape
        y = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(jnp.float32)
        amax0 = jnp.maximum(jnp.max(jnp.abs(y), axis=(0, 1, 2)), 1e-6)
        y1 = self._up_phase(y, qp["up_w_f32"], qp["up_b_0"]
                            ).astype(jnp.float32)
        amax1 = jnp.maximum(jnp.max(jnp.abs(y1), axis=(0, 1, 2)), 1e-6)
        s0 = (127.0 / amax0).astype(jnp.float32)   # [C]
        s1 = (127.0 / amax1).astype(jnp.float32)   # [4*C_up]

        def q_oc(wk):
            amax = jnp.max(jnp.abs(wk), axis=tuple(range(wk.ndim - 1)),
                           keepdims=True)
            s = 127.0 / jnp.maximum(amax, 1e-8)
            q = jnp.clip(jnp.round(wk * s), -127, 127).astype(jnp.int8)
            return q, (1.0 / s).reshape(-1)

        qp = dict(qp)
        # up conv contraction lanes are (col-tap, c): tile s0 by KW
        kw = qp["up_w_f32"].shape[1] // self.filters
        qp["up_w_q"], qp["up_w_ws"] = q_oc(
            qp["up_w_f32"] / jnp.tile(s0, kw)[None, :, None])
        # head input channels are W-pair slots (cx*4C' + u): tile s1 by 2
        qp["final_w_q"], qp["final_w_ws"] = q_oc(
            qp["head_w_f32"] / jnp.tile(s1, 2)[None, None, :, None])
        qp["tail_s0"] = s0
        qp["tail_s1"] = s1
        return qp

    # ------------------------------------------------------------- apply
    def apply_stem(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        n, h, w, _ = x.shape
        y = vops.same_conv(x.astype(self.dtype), qp["stem_w"], qp["stem_b"])
        y = vops.prelu(y, qp["stem_alpha"])
        return y.reshape(n, h, w // self.pack, self.cp)  # packed

    def apply_trunk(self, qp: Dict[str, Any], h0: jax.Array) -> jax.Array:
        """Packed stem output -> packed trunk output (fused kernels)."""
        n, h, wp_, cp = h0.shape
        pack = self.pack
        hw = h * wp_ * pack
        quant = self.quant

        if quant:
            # dynamic per-tensor scale for the (un-normalized) stem output
            sx = jnp.maximum(jnp.max(jnp.abs(h0.astype(jnp.float32))), 1e-8)
            s_row = jnp.broadcast_to((127.0 / sx) / RES_QSCALE, (n, cp))
            a, st = fc.fused_conv_stats(
                h0, qp["w_pre_0"], pads=self.pads["w_pre_0"],
                pre="affine_act", act="none", scale=s_row,
                shift=jnp.zeros((n, cp), jnp.float32),
                quant=True, qscale=RES_QSCALE, stats_mode=self.stats_mode)
        else:
            a, st = fc.fused_conv_stats(h0, qp["w_pre_0"],
                                        pads=self.pads["w_pre_0"],
                                        stats_mode=self.stats_mode)

        hs = h0  # residual stream (bf16, packed)
        for i in range(self.res_block_num):
            s1, t1 = fc.stats_to_scale_shift(st, qp[f"g1_{i}"],
                                             qp[f"b1_{i}"], pack, hw)
            b_raw, st2 = fc.fused_conv_stats(
                a, qp[f"w_post_{i}"], pads=self.pads[f"w_post_{i}"],
                pre="affine_act", act="prelu", scale=s1, shift=t1,
                alpha=qp[f"alpha_{i}"], quant=quant, qscale=QSCALE,
                stats_mode=self.stats_mode)
            s2, t2 = fc.stats_to_scale_shift(st2, qp[f"g2_{i}"],
                                             qp[f"b2_{i}"], pack, hw)
            nxt = (f"w_pre_{i + 1}" if i + 1 < self.res_block_num
                   else "w_prefinal")
            a, hs, st = fc.fused_conv_stats(
                b_raw, qp[nxt], pads=self.pads[nxt],
                pre="affine_res", scale=s2, shift=t2, res=hs,
                quant=quant, qscale=RES_QSCALE, stats_mode=self.stats_mode)

        # prefinal norm apply + global skip (one fused pass)
        sp_, tp_ = fc.stats_to_scale_shift(st, qp["g_pf"], qp["b_pf"],
                                           pack, hw)
        return _apply_res(a, h0, sp_, tp_)

    def _tail_bf16_xpack(self, qp: Dict[str, Any], y: jax.Array,
                         emit_u8: bool = False) -> jax.Array:
        """bf16 x-packed tail on the r=1 canonical stream."""
        if self.up_fused_ok:
            y1 = self._up_phase(y, qp["up_w_p"], qp["up_b_0"])
            n, h, w_, cs = y1.shape
            y1 = y1.reshape(n, h, w_ // 2, 2 * cs)  # free W-pair pack
        else:
            y1 = self._up_xpack(y, qp["up_w_x"], qp["up_b_0"])
        yp = head_conv.head_conv_s48(
            y1, qp["head_w_x"], None,
            jnp.tile(qp["final_b"], 32).astype(jnp.float32),
            self.final_px_q, emit_u8=emit_u8)
        return sp.depth_to_space_axes(yp, 4, 8)

    def _up_phase(self, y: jax.Array, wmat: jax.Array, b) -> jax.Array:
        """Fused transpose conv + LeakyReLU on the UNPACKED r=1 stream:
        [N,H,W,C] -> [N,H,W,4C'] (dtype follows the inputs) via the
        Pallas kernel (ops/pallas/up_conv.py; XLA reference off-TPU)."""
        return upc.up_conv_fused(
            y, wmat, None, jnp.tile(b, 4).astype(jnp.float32),
            self.up_px, quant=False)

    def _up_xpack(self, y: jax.Array, wk: jax.Array, b) -> jax.Array:
        """x-packed transpose conv + LeakyReLU on the r=1 canonical
        stream: [N,H,W,C] -> [N,H,W/2,8C'] (dtype follows the inputs) —
        the XLA fallback when the fused kernel's geometry doesn't apply."""
        from jax import lax

        n, h, w_, c = y.shape
        y = y.reshape(n, h, w_ // 2, 2 * c)  # free W-pair pack
        y1 = lax.conv_general_dilated(y, wk, (1, 1), self.up_pads_q,
                                      dimension_numbers=sp.CONV_DIMS)
        y1 = y1 + jnp.tile(b, 8).astype(y1.dtype)
        return vops.leaky_relu(y1, 0.2)

    def apply_tail(self, qp: Dict[str, Any], trunk: jax.Array,
                   emit_u8: bool = False) -> jax.Array:
        """Packed trunk output -> HR image (prepacked phase tail).

        ``emit_u8``: emit codec uint8 frames straight from the head conv
        epilogue (x-packed tails fold it into the conv; others convert
        after) — the streaming clip path's output format."""
        n, h, wp_, cp = trunk.shape
        y = trunk.reshape(n, h, wp_ * self.pack, self.filters
                          ).astype(self.dtype)  # unpack to canonical r=1
        if self.tail_quant_ready and "tail_s0" in qp:
            # structural tail selection: calibrate() is the only source
            # of a qp containing tail_s0, and jit caches are keyed on
            # the pytree structure — so a jitted apply traced before
            # calibration retraces on the calibrated qp, and a stale
            # un-calibrated qp keeps the bf16 tail instead of running
            # int8 with a zero scale.
            return self._tail_int8(qp, y, emit_u8=emit_u8)
        if self.xpack_ready:
            return self._tail_bf16_xpack(qp, y, emit_u8=emit_u8)
        if emit_u8:
            from video_cycle_gan_upscaling_tpu.ops.codec import unit_to_uint8

            return unit_to_uint8(self.apply_tail(qp, trunk))
        if self.block0 > 1:
            y = sp.space_to_depth(y, self.block0)
        r = self.block0
        for i in range(self.times):
            y = sp.transpose_conv_phase_packed(y, qp[f"up_w_{i}"],
                                               self.up_plans[i],
                                               qp[f"up_b_{i}"])
            y = vops.leaky_relu(y, 0.2)
            r *= 2
        if self.final_mode == "asym":
            from jax import lax

            n2, gh, gw, cs = y.shape
            y2 = y.reshape(n2, gh, gw // 2, 2 * cs)  # free W-pair merge
            yp = lax.conv_general_dilated(
                y2, qp["final_w"].astype(y2.dtype), (1, 1), self.final_pads,
                dimension_numbers=sp.CONV_DIMS)
            yp = yp + jnp.tile(qp["final_b"], 2 * r * r).astype(yp.dtype)
            yp = jnp.tanh(yp.astype(jnp.float32))
            return sp.depth_to_space_axes(yp, r, 2 * r)
        yp = sp.conv_same_phase_blocked_packed(y, qp["final_w"],
                                               self.final_plan,
                                               qp["final_b"])
        yp = jnp.tanh(yp.astype(jnp.float32))
        return sp.depth_to_space(yp, r * self.extra)

    def _tail_int8(self, qp: Dict[str, Any], y: jax.Array,
                   emit_u8: bool = False) -> jax.Array:
        """W8A8 tail (calibrated), x-packed structure (see __init__): the
        transpose conv runs on W-pair-packed input at full K lanes, the
        big phase intermediate is stored int8 (half HBM traffic), and the
        head conv runs in the stride-(2,2) S=(4,8) form straight on that
        layout (ops/head_conv.py: 96 of 128 output lanes, no relayouts).
        Scales: per-CHANNEL activation scales (tail_s0/tail_s1) were
        folded into the weights' input axes at calibration, and the
        per-out-channel weight scales ride through the positively-
        homogeneous LeakyReLU into the elementwise dequant — so
        channel-wise quantization costs no extra runtime ops."""
        s0, s1 = qp["tail_s0"], qp["tail_s1"]  # [C], [4*C_up]
        q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * s0), -127, 127
                      ).astype(jnp.int8)
        # fused Pallas up conv: conv + dequant + bias + LeakyReLU +
        # requant in one kernel — the phase intermediate crosses HBM
        # once, already int8. s1 folds through the positively-
        # homogeneous LeakyReLU into the dequant/bias.
        q1 = upc.up_conv_fused(
            q0, qp["up_w_q"], qp["up_w_ws"] * s1,
            jnp.tile(qp["up_b_0"], 4).astype(jnp.float32) * s1,
            self.up_px, quant=True)
        n, h, w_, cs = q1.shape
        q1 = q1.reshape(n, h, w_ // 2, 2 * cs)  # free W-pair pack
        yp = head_conv.head_conv_s48(
            q1, qp["final_w_q"], qp["final_w_ws"],
            jnp.tile(qp["final_b"], 32).astype(jnp.float32),
            self.final_px_q, emit_u8=emit_u8)
        return sp.depth_to_space_axes(yp, 4, 8)

    def apply(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        """[N,H,W,3] in [-1,1] -> [N,H*f,W*f,3]; jit me."""
        return self.apply_tail(qp, self.apply_trunk(qp, self.apply_stem(qp, x)))

    def apply_u8(self, qp: Dict[str, Any], x: jax.Array) -> jax.Array:
        """[N,H,W,3] in [-1,1] -> codec uint8 [N,H*f,W*f,3]: the emit is
        folded into the head-conv epilogue so no f32 HR tensor exists
        (4x less HBM on every post-head pass) — the clip path's mode."""
        return self.apply_tail(qp, self.apply_trunk(qp, self.apply_stem(qp, x)),
                               emit_u8=True)

    def __call__(self, qp, x):
        return self.apply(qp, x)


def _apply_res(x, res, scale, shift):
    """y = x*scale + shift + res on packed tensors (Pallas on TPU)."""
    use_pallas = fc._HAVE_PALLAS and (pnorms._on_tpu() or pnorms.INTERPRET)
    if use_pallas:
        return pnorms._apply_res_pallas(x, res, scale, shift)
    return (x.astype(jnp.float32) * scale[:, None, None, :]
            + shift[:, None, None, :]
            + res.astype(jnp.float32)).astype(x.dtype)


def make_fast_orig(params, cfg_model, upscale_factor: int,
                   tile_hw: Tuple[int, int], quant: bool = False,
                   dtype=jnp.bfloat16):
    """(apply_fn, qp) pair for the tiled-inference harness; falls back to
    None when the fused path doesn't support the config (caller keeps the
    modular path)."""
    h, w = tile_hw
    ok = (cfg_model.norm == "instance" and h % 2 == 0 and w % 2 == 0)
    if not ok:
        return None
    runner = FastOrigRunner(
        params, res_block_num=cfg_model.res_block_num,
        upscale_factor=upscale_factor, tile_hw=tile_hw,
        filters=cfg_model.filters, quant=quant, dtype=dtype)
    return runner
