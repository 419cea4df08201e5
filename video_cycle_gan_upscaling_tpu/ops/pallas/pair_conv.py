"""Fused pair-packed up-conv kernel (the phase-tail transpose conv).

The x-packed tail's transpose conv (fast_infer._up_xpack / _tail_int8)
is a [ny, nx, 2C, 8C'] conv on the W-pair-packed canonical stream. Run
through XLA as an int8 convolution it leaves ~3/4 of the int8 roofline
on the floor (scripts/microbench_r3g.py: 17.11 ms/f measured vs 4.14
ideal at the x4 geometry) because the epilogue cannot fuse into the
conv custom call: the int32 accumulator ([N,H,W/2,8C'] — 8.5 GB per
x4 batch-8) and the dequantized activation each make a full HBM round
trip, and the input requant is one more.

This kernel runs the whole stage in one VMEM pass per row-block:

    load bf16 pair-packed rows (sliver halos for the ny row taps)
    -> per-lane requant to int8 (scales folded at calibration)
    -> ny row-tap int8 matmuls over the nx-fold lane window (MXU,
       int32 accumulate)
    -> dequant (per-out-channel weight scales) + bias + LeakyReLU
    -> emit bf16 (hybrid tail) or re-quantized int8 (full-turbo tail)

so the only HBM traffic is the bf16 input once and the output once.
A bf16 weight variant (``w`` bf16, ``in_scales=None``) serves the
uncalibrated/bf16 tail with the same dataflow.

Same sliver-halo/independent-grid-step structure as the trunk kernel
(ops/pallas/fused_conv.py) — the carry/serialized designs measured
slower twice (docs/PERF.md negative results).

Reference semantics: the upsampling stage of make_upscaler_orig
(/root/reference/upscaling/upscaler/model.py:70-75, 287-288), evaluated
in phase space.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

from video_cycle_gan_upscaling_tpu.ops.pallas import norms as _norms

_VMEM_BUDGET = 40 * 1024 * 1024


def _pick_th(h: int, w2: int, k2: int, co: int, ny: int, nx: int, *,
             quant: bool, in_int8: bool, out_int8: bool,
             py_l: int, py_h: int) -> Optional[int]:
    """Largest divisor of h (even preferred) whose working set fits the
    VMEM budget; None -> caller falls back to XLA."""
    in_b = 1 if in_int8 else 2  # int8 or bf16 input stream
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        if (py_l and th % py_l) or (py_h and th % py_h):
            continue
        x_in = (th + ny - 1) * w2 * k2 * in_b * 2          # cur+slivers, dbuf
        # nx-fold lane window
        xq = (th + ny - 1) * w2 * nx * k2 * (1 if quant else 2)
        acc = th * w2 * co * 4
        y_out = th * w2 * co * (1 if out_int8 else 2) * 2  # dbuf
        w_buf = ny * nx * k2 * co * (1 if quant else 2)
        total = x_in + xq + acc + y_out + w_buf + 4 * co * 4
        if total <= _VMEM_BUDGET:
            best = th
    return best


def _kernel(*refs, th: int, ny: int, nx: int, px_l: int, py_l: int,
            py_h: int, quant: bool, in_int8: bool, out_int8: bool,
            has_zp: bool, slope: float):
    """Grid (N, H//TH). refs: [x_top,] x_cur, [x_bot,] [qs,] w, ws, b,
    [out_qs,] y_out."""
    it = iter(refs)
    x_top = next(it) if py_l else None
    x_cur = next(it)
    x_bot = next(it) if py_h else None
    qs_ref = next(it) if (quant and not in_int8) else None
    w_ref = next(it)
    ws_ref = next(it)
    b_ref = next(it)
    oqs_ref = next(it) if out_int8 else None
    ozp_ref = next(it) if (out_int8 and has_zp) else None
    y_ref = next(it)

    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    w2 = y_ref.shape[2]
    k2 = x_cur.shape[3]

    if in_int8:
        cast = lambda z: z.astype(jnp.int8)  # pre-quantized stream
    elif quant:
        q = qs_ref[0, :].astype(jnp.float32)

        def cast(z):
            z = z.astype(jnp.float32) * q
            return jnp.clip(jnp.round(z), -127.0, 127.0).astype(jnp.int8)
    else:
        cast = lambda z: z.astype(jnp.bfloat16)

    pieces = []
    if py_l:
        z_top = jnp.where(i > 0, x_top[0].astype(jnp.float32), 0.0)
        pieces.append(cast(z_top))
    pieces.append(cast(x_cur[0]))
    if py_h:
        z_bot = jnp.where(i < n_i - 1, x_bot[0].astype(jnp.float32), 0.0)
        pieces.append(cast(z_bot))
    zw = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)

    # nx-fold lane window (zero at W borders), dx-major lane order to
    # match the [ny, nx*2C, CO] kernel reshape
    rows = zw.shape[0]
    cols = []
    zero_col = jnp.zeros((rows, 1, k2), zw.dtype)
    for dx in range(nx):
        o = dx - px_l
        if o < 0:
            piece = jnp.concatenate(
                [jnp.broadcast_to(zero_col, (rows, -o, k2)),
                 zw[:, : w2 + o, :]], axis=1)
        elif o > 0:
            piece = jnp.concatenate(
                [zw[:, o:, :],
                 jnp.broadcast_to(zero_col, (rows, o, k2))], axis=1)
        else:
            piece = zw
        cols.append(piece)
    xcat = jnp.concatenate(cols, axis=-1)  # [rows, W2, nx*K2]

    acc_t = jnp.int32 if quant else jnp.float32
    dims = (((2,), (0,)), ((), ()))
    acc = lax.dot_general(xcat[0:th], w_ref[0], dims,
                          preferred_element_type=acc_t)
    for dy in range(1, ny):
        acc = acc + lax.dot_general(xcat[dy:dy + th], w_ref[dy], dims,
                                    preferred_element_type=acc_t)

    y = acc.astype(jnp.float32) * ws_ref[0, :] + b_ref[0, :]
    y = jnp.where(y < 0.0, slope * y, y)
    if out_int8:
        y = y * oqs_ref[0, :]
        if has_zp:
            y = y - ozp_ref[0, :]
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
        y_ref[0] = y.astype(jnp.int8)
    else:
        y_ref[0] = y.astype(jnp.bfloat16)


def pair_conv_fused(
    x: jax.Array,
    w: jax.Array,
    *,
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    w_scales: Optional[jax.Array],
    bias: jax.Array,
    in_scales: Optional[jax.Array] = None,
    out_scales: Optional[jax.Array] = None,
    out_zp: Optional[jax.Array] = None,
    negative_slope: float = 0.2,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """LeakyReLU(conv(quant(x), w) * w_scales + bias) [* out_scales->int8].

    x: [N,H,W2,2C] bf16/f32 pair-packed stream, OR a pre-quantized int8
       stream (``in_scales=None`` with an int8 ``w`` — the exact-phase
       stage-1 case, where the stage-0 kernel already emitted int8).
    w: [ny, nx, 2C, CO] int8 (with ``w_scales``) or bf16/f32
       (``in_scales=None`` -> bf16 path, ``w_scales`` ignored/None).
    pads: ((py_l, py_h), (px_l, px_h)) from rearrange_same_kernel_axes;
       any split with py_l + py_h == ny - 1 is supported (the per-phase
       exact kernels have asymmetric 2-row supports).
    in_scales: [2C] f32 per-lane input quant scales (already folded into
       the int8 weights' input axes at calibration).
    out_scales: [CO] f32 -> emit int8 (full-turbo tail); None -> bf16.
    out_zp: [CO] f32 optional zero points for an ASYMMETRIC int8 emit
       (q = round(y*s - zp)) — post-LeakyReLU streams are skewed, so
       the offset buys ~4 dB on the head-input requant; the consumer
       adds the matching correction map (fast_infer head_corr).
    """
    n, h, w2, k2 = x.shape
    ny, nx, k2w, co = w.shape
    assert k2w == k2, (w.shape, x.shape)
    (py_l, py_h), (px_l, px_h) = pads
    assert px_l + px_h == nx - 1, pads
    assert py_l + py_h == ny - 1, pads
    in_int8 = x.dtype == jnp.int8
    quant = in_scales is not None or in_int8
    assert not (in_int8 and in_scales is not None), \
        "int8 input is already quantized; in_scales must be None"
    out_int8 = out_scales is not None
    has_zp = out_zp is not None
    assert not (has_zp and not out_int8), "out_zp needs out_scales"
    if interpret is None:
        interpret = _norms.INTERPRET
    # Measured dispatch (scripts/pair_conv_ab.py + in-graph bench A/B on
    # v5e): the fused kernel wins when EMITTING INT8 (9.96 vs 10.84 ms/f
    # at the x4 stage-1 geometry — the int8 emit halves the output HBM
    # crossing and XLA can't fuse the requant into its conv custom
    # call); when emitting bf16, XLA's conv + fused epilogue is equal or
    # faster (hybrid-tail clip 27.96 -> 26.85 fps regression when forced
    # through the kernel), so bf16-emit stays on the XLA chain.
    # VCGU_PAIR_XLA=1 / VCGU_PAIR_PALLAS=1 force either side for A/Bs.
    if _os.environ.get("VCGU_PAIR_XLA") == "1":
        want_pallas = False
    else:  # interpret mode always runs the kernel (test coverage)
        want_pallas = (out_int8 or bool(interpret)
                       or _os.environ.get("VCGU_PAIR_PALLAS") == "1")
    use_pallas = (_HAVE_PALLAS and (_norms._on_tpu() or interpret)
                  and want_pallas)
    th = _pick_th(h, w2, k2, co, ny, nx, quant=quant, in_int8=in_int8,
                  out_int8=out_int8, py_l=py_l, py_h=py_h) \
        if use_pallas else None
    if th is None:
        return _reference(x, w, pads=pads, w_scales=w_scales, bias=bias,
                          in_scales=in_scales, out_scales=out_scales,
                          out_zp=out_zp, negative_slope=negative_slope)

    grid = (n, h // th)

    def cur_map(ni, i):
        return (ni, i, 0, 0)

    def top_map(ni, i):
        return (ni, jnp.maximum(i * (th // py_l) - 1, 0), 0, 0)

    def bot_map(ni, i):
        return (ni, jnp.minimum(i * (th // py_h) + th // py_h,
                                h // py_h - 1), 0, 0)

    def blk(rows, rmap):
        return pl.BlockSpec((1, rows, w2, k2), rmap,
                            memory_space=pltpu.VMEM)

    in_specs = []
    args = []
    if py_l:
        in_specs.append(blk(py_l, top_map))
        args.append(x)
    in_specs.append(blk(th, cur_map))
    args.append(x)
    if py_h:
        in_specs.append(blk(py_h, bot_map))
        args.append(x)
    vec = lambda c: pl.BlockSpec((1, c), lambda ni, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    if quant and not in_int8:
        in_specs += [vec(k2)]
        args += [jnp.asarray(in_scales, jnp.float32).reshape(1, k2)]
    in_specs += [pl.BlockSpec((ny, nx * k2, co), lambda ni, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [w.reshape(ny, nx * k2, co)]
    ws_vec = (jnp.asarray(w_scales, jnp.float32).reshape(1, co) if quant
              else jnp.ones((1, co), jnp.float32))
    in_specs += [vec(co), vec(co)]
    args += [ws_vec, jnp.asarray(bias, jnp.float32).reshape(1, co)]
    if out_int8:
        in_specs += [vec(co)]
        args += [jnp.asarray(out_scales, jnp.float32).reshape(1, co)]
        if has_zp:
            in_specs += [vec(co)]
            args += [jnp.asarray(out_zp, jnp.float32).reshape(1, co)]

    out_dtype = jnp.int8 if out_int8 else jnp.bfloat16
    kernel = functools.partial(_kernel, th=th, ny=ny, nx=nx, px_l=px_l,
                               py_l=py_l, py_h=py_h, quant=quant,
                               in_int8=in_int8, out_int8=out_int8,
                               has_zp=has_zp, slope=negative_slope)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w2, co), cur_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w2, co), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _reference(x, w, *, pads, w_scales, bias, in_scales, out_scales,
               negative_slope, out_zp=None):
    """Pure-XLA fallback: identical math (int32 accumulation, same f32
    epilogue order), used on CPU and as the test oracle."""
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    ny, nx, k2, co = w.shape
    if in_scales is not None or x.dtype == jnp.int8:
        q = x if x.dtype == jnp.int8 else jnp.clip(
            jnp.round(x.astype(jnp.float32) * in_scales.reshape(-1)),
            -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            q, w, (1, 1), pads, dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * w_scales.reshape(-1) + bias.reshape(-1)
    else:
        acc = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), pads,
            dimension_numbers=sp.CONV_DIMS)
        y = acc.astype(jnp.float32) + bias.reshape(-1)
    y = jnp.where(y < 0.0, negative_slope * y, y)
    if out_scales is not None:
        y = y * out_scales.reshape(-1)
        if out_zp is not None:
            y = y - out_zp.reshape(-1)
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)
