"""S=(4,8) stride-(2,2) head conv for the W8A8 inference tail.

The flagship tail ends with the 9x9 -> 3ch head conv evaluated in phase
space (ops/subpixel.py). At S=(4,4) blocking the XLA conv uses 48 of
128 MXU output lanes and needs a space_to_depth relayout of the 4 GB
int8 intermediate first. This module evaluates the SAME linear map as a
stride-(2,2) conv DIRECTLY on the up conv's x-packed output layout
[N, H, W/2, 8C]: the row-pair (ey) and col-pair (p) foldings that give
the S=(4,8) form become the conv's strides, the (row-tap, ey) pairs
become 6 kernel rows and the (col-tap, p) pairs 4 kernel columns —
96 of 128 output lanes, zero relayouts. Measured on v5e (scripts/
head_ab.py, b8 540p): 5.67 ms/frame vs 10.51 for the s2d + S=4 path,
with bit-exact parity. (A Pallas carry-based kernel of the same S=(4,8)
math measured 7+ ms/frame — its serialized row carry lost more to
pipeline stalls than the lanes won; docs/PERF.md.)

Reference semantics: the final Conv2D(3, 9x9) + tanh of
/root/reference/upscaling/upscaler/model.py:291-295, evaluated per
ops/subpixel.py's phase algebra.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from video_cycle_gan_upscaling_tpu.ops import subpixel as sp


def prepack_head_s48(w9: jax.Array, c_up: int):
    """[9,9,C,3] head kernel -> (W [6,4,8C,96] f32, col pads) for
    ``head_conv_s48``.

    The up conv's x-packed intermediate [N, H, W/2, 8C] has channel
    u = cx*4C + (a*2+b)*C + o (cx: up-conv input W-pair slot, (a,b):
    transpose-conv phases, o: up-conv output channel) at LR position
    (row, w4), representing HR pixel (2*row + a, 4*w4 + 2*cx + b). A
    stride-(2,2) window therefore sees HR rows 4*h2 + (2*ky + a) for
    kernel row j = 2*iy + ey (iy: S_y=4 phase-kernel row, ey: row
    parity) and HR cols 8*w2 + (4*p + 2*cx + b) for kernel col
    gamma = 2*vx + p (vx: S_x=8 phase-kernel col, p: col parity).
    """
    wk98, (py_l, py_h), (px_l, px_h) = sp.rearrange_same_kernel_axes(
        w9.astype(jnp.float32), 4, 8)
    ny, nx, cin, cout = wk98.shape
    assert ny == 3 and (py_l, py_h) == (1, 1), (ny, py_l, py_h)
    assert cin == 32 * c_up and cout == 32 * w9.shape[-1], wk98.shape

    u = np.arange(8 * c_up)
    o = u % c_up
    t = u // c_up  # cx*4 + a*2 + b
    cx, rem = t // 4, t % 4
    a, b = rem // 2, rem % 2
    rows = []
    for iy in range(ny):
        for ey in (0, 1):  # kernel row j = 2*iy + ey
            cols = []
            for vx in range(nx):
                for p in (0, 1):  # kernel col gamma = 2*vx + p
                    canon = ((2 * ey + a) * 8 + p * 4 + cx * 2 + b
                             ) * c_up + o
                    cols.append(wk98[iy, vx, canon, :])
            rows.append(jnp.stack(cols))
    w_out = jnp.stack(rows)  # [6, 2*nx, 8*c_up, 96]
    return w_out, (2 * px_l, 2 * px_h)


def head_conv_s48(q1: jax.Array, wq: jax.Array, ws, bias96: jax.Array,
                  px: tuple, emit_u8: bool = False) -> jax.Array:
    """q1 [N,H,W2,8C] -> tanh'd f32 [N,H/2,W2/2,96] (S=(4,8) phase-major
    channels; finish with depth_to_space_axes(.,4,8)).

    wq [6,4,8C,96] from ``prepack_head_s48``. int8 path (W8A8): wq int8
    and ws f32 [96] per-out-channel dequant scales with the activation
    scale folded in by the caller. bf16 path: wq bf16, ws None.
    bias96 f32 [96] (jnp.tile(bias, 32)).

    ``emit_u8``: fold the codec emit (ops/codec.py unit_to_uint8) into
    the conv epilogue — the HR stream then leaves the head as uint8, so
    the depth_to_space relayout and every downstream pass move 1 byte/px
    instead of 4 (the clip path's operating mode).

    A fused Pallas variant of this stage (ops/pallas/head_s48.py)
    measured SLOWER than this XLA formulation isolated on v5e (int8
    5.45 vs 4.63 ms/f; bf16 OOM'd at the flagship geometry) — XLA
    already runs the head near its padded-form roofline and fuses the
    tanh + uint8 emit into the conv epilogue. Kept env-gated
    (VCGU_HEAD_PALLAS=1) with its oracle tests; docs/PERF.md round 3."""
    import os as _os

    if (_os.environ.get("VCGU_HEAD_PALLAS", "0") == "1"
            and bias96.ndim == 1):  # map bias: zero-point corrected path
        from video_cycle_gan_upscaling_tpu.ops.pallas import head_s48

        out = head_s48.head_s48_fused(q1, wq, ws, bias96, px,
                                      emit_u8=emit_u8)
        if out is not None:
            return out
    yp = jnp.tanh(head_conv_s48_pre(q1, wq, ws, bias96, px))
    if emit_u8:
        return jnp.clip(jnp.round((yp + 1.0) * 127.5), 0, 255
                        ).astype(jnp.uint8)
    return yp


def head_conv_s48_pre(q1: jax.Array, wq: jax.Array, ws, bias96: jax.Array,
                      px: tuple) -> jax.Array:
    """``head_conv_s48`` up to (excluding) the tanh — the pre-activation
    the calibration bias-correction pass compares against.

    ``bias96`` is either a [96] vector or a [1,Ho,Wo,96] MAP (the
    zero-point-corrected head bias built by FastOrigRunner.calibrate:
    bias + the border-aware zp correction conv)."""
    yp = head_conv_s48_acc(q1, wq, px).astype(jnp.float32)
    if ws is not None:
        yp = yp * ws[None, None, None, :]
    return yp + (bias96 if bias96.ndim == 4
                 else bias96[None, None, None, :])


def head_conv_s48_acc(q1: jax.Array, wq: jax.Array, px: tuple) -> jax.Array:
    """Raw head-conv accumulator (int32 for int8 inputs, f32 otherwise).

    The head is linear over input-lane groups, so callers holding the up
    conv's output as per-phase PARTS (the exact-phase stage-1 path,
    models/fast_infer.py) run one of these per part on its lane slice of
    the kernel and sum — the concatenated HR stream never materializes."""
    acc_t = (jnp.int32 if jnp.issubdtype(q1.dtype, jnp.integer)
             else jnp.float32)
    return lax.conv_general_dilated(
        q1, wq, (2, 2), ((2, 3), px),
        dimension_numbers=sp.CONV_DIMS,
        preferred_element_type=acc_t)


def head_epilogue(yp_pre: jax.Array, emit_u8: bool) -> jax.Array:
    """tanh (+ codec uint8 emit) — head_conv_s48's epilogue on an
    externally assembled pre-activation."""
    yp = jnp.tanh(yp_pre)
    if emit_u8:
        return jnp.clip(jnp.round((yp + 1.0) * 127.5), 0, 255
                        ).astype(jnp.uint8)
    return yp


def head_lane_slice(c_up: int, ph: int):
    """Input-lane indices of output phase ``ph`` (a,b) in the x-packed
    8C layout (u = cx*4C + ph*C + o): both W-pair slots, that phase's C
    channels."""
    import numpy as np

    o = np.arange(c_up)
    return np.concatenate([cx * 4 * c_up + ph * c_up + o for cx in (0, 1)])


def head_group_lane_slice(c_up: int, pa: int, pb: int):
    """Input-lane indices of the PHASE-PAIR stream (pa, pb) in the
    x-packed 8C layout: the grouped stage-1 conv emits [.., 2*cq]
    (member-major) which W-pair-reshapes to lanes u' = cx*2C + j*C + o
    for member j in (pa, pb); this maps u' -> the full head kernel's
    u = cx*4C + ph_j*C + o."""
    import numpy as np

    o = np.arange(c_up)
    return np.concatenate([
        np.concatenate([cx * 4 * c_up + ph * c_up + o for ph in (pa, pb)])
        for cx in (0, 1)])
