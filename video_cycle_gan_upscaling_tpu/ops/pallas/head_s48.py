"""Fused S=(4,8) head-conv kernel (the 9x9 -> 3ch final conv + tanh).

The tail's head conv runs as a stride-(2,2) [6,4,8C,96] conv straight on
the up conv's x-packed layout (ops/head_conv.py). Under XLA it measures
5.7-7.1 ms/frame against a 3.1 ms/f padded-form bf16 roofline (and the
epilogue tanh + codec uint8 emit are separate HBM passes). This kernel
runs the whole stage in one VMEM pass per row-block:

    view the input as ROW PAIRS (free [N,H,W2,K] -> [N,H/2,2,W2/2,2K]
    HBM reshape: the row pairing splits a leading axis and the W-pair
    fold merges into lanes) -> the stride-(2,2) conv becomes 3 pair-row
    taps x 2 parities x 2 packed-col taps = 12 MXU matmuls per block
    (K = 2*8C contraction, int32/f32 accumulate)
    -> dequant (per-out-channel scales) + bias + tanh
    -> emit codec uint8 (clip path) or f32

so the 0.5-1 GB/frame head input crosses HBM exactly once and nothing
else does. Same sliver-halo independent-grid-step structure as
ops/pallas/pair_conv.py; the XLA fallback (ops/head_conv.py) is the
oracle and the CPU path.

Reference semantics: the final Conv2D(3, 9x9) + tanh of
/root/reference/upscaling/upscaler/model.py:291-295, evaluated per
ops/subpixel.py's phase algebra at S=(4,8) blocking.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

from video_cycle_gan_upscaling_tpu.ops.pallas import norms as _norms

_VMEM_BUDGET = 40 * 1024 * 1024


def _pick_th(h2: int, w4: int, k2p: int, co: int, xb: int, ob: int
             ) -> Optional[int]:
    """Largest divisor of h2 (output row-pairs per block) fitting the
    VMEM budget; None -> caller falls back to XLA."""
    co_pad = max(co, 128)  # lane padding of the 96-ch accumulator
    best = None
    for th in range(1, h2 + 1):
        if h2 % th:
            continue
        x_in = (th + 2) * 2 * w4 * k2p * xb * 2      # cur+slivers, dbuf
        w_buf = 12 * k2p * co * xb
        acc = th * w4 * co_pad * 4
        y_out = th * w4 * co_pad * ob * 2            # dbuf
        if x_in + w_buf + acc + y_out + 4 * co * 4 <= _VMEM_BUDGET:
            best = th
    return best


def _kernel(x_top, x_cur, x_bot, w_ref, ws_ref, b_ref, y_ref, *,
            th: int, o0: int, quant: bool, emit_u8: bool):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    w4 = y_ref.shape[2]
    k2p = x_cur.shape[4]

    z_top = jnp.where(i > 0, x_top[0].astype(jnp.float32), 0.0)
    z_bot = jnp.where(i < n_i - 1, x_bot[0].astype(jnp.float32), 0.0)
    zdt = x_cur.dtype
    zw = jnp.concatenate(
        [z_top.astype(zdt), x_cur[0], z_bot.astype(zdt)], axis=0
    )  # [th+2, 2, W4, K2P] row-pair window

    # packed-col taps: offsets {o0, o0+1} with zero columns at W borders
    zero_col = jnp.zeros((zw.shape[0], 2, 1, k2p), zw.dtype)
    shifted = []
    for c in range(2):
        o = o0 + c
        if o < 0:
            piece = jnp.concatenate(
                [jnp.broadcast_to(zero_col, (zw.shape[0], 2, -o, k2p)),
                 zw[:, :, : w4 + o, :]], axis=2)
        elif o > 0:
            piece = jnp.concatenate(
                [zw[:, :, o:, :],
                 jnp.broadcast_to(zero_col, (zw.shape[0], 2, o, k2p))],
                axis=2)
        else:
            piece = zw
        shifted.append(piece)

    acc_t = jnp.int32 if quant else jnp.float32
    dims = (((2,), (0,)), ((), ()))
    acc = None
    for dy in range(3):
        for e in range(2):
            for c in range(2):
                part = lax.dot_general(
                    shifted[c][dy:dy + th, e], w_ref[(dy * 2 + e) * 2 + c],
                    dims, preferred_element_type=acc_t)
                acc = part if acc is None else acc + part

    y = acc.astype(jnp.float32) * ws_ref[0, :] + b_ref[0, :]
    y = jnp.tanh(y)
    if emit_u8:
        y = jnp.clip(jnp.round((y + 1.0) * 127.5), 0.0, 255.0)
        # Mosaic has no f32->u8 cast; go via int32 (values are 0..255)
        y_ref[0] = y.astype(jnp.int32).astype(jnp.uint8)
    else:
        y_ref[0] = y.astype(y_ref.dtype)


def head_s48_fused(q1: jax.Array, wq: jax.Array, ws, bias96: jax.Array,
                   px: tuple, emit_u8: bool = False,
                   interpret: Optional[bool] = None):
    """tanh(conv_s2x2(q1, wq) * ws + bias96) [-> codec uint8], fused.

    Same contract as ops/head_conv.head_conv_s48: q1 [N,H,W2,8C] int8
    (W8A8, ws [96] dequant scales) or bf16/f32 (ws None); wq [6,4,8C,96]
    from prepack_head_s48; px the (even) column pads. Returns
    [N, H/2, W2/2, 96] uint8 (emit_u8) or f32.

    Returns None when the kernel doesn't support the geometry (odd
    shapes, pads, VMEM) — the caller keeps the XLA formulation.
    """
    n, h, w2, k2 = q1.shape
    kj, kg, k2w, co = wq.shape
    if (kj, kg) != (6, 4) or k2w != k2:
        return None
    px_l, px_h = px
    if (px_l % 2) or (px_l + px_h != 2) or (h % 2) or (w2 % 2):
        return None
    if interpret is None:
        interpret = _norms.INTERPRET
    if not (_HAVE_PALLAS and (_norms._on_tpu() or interpret)):
        return None
    quant = q1.dtype == jnp.int8
    h2, w4, k2p = h // 2, w2 // 2, 2 * k2
    xb = q1.dtype.itemsize
    ob = 1 if emit_u8 else 4
    th = _pick_th(h2, w4, k2p, co, xb, ob)
    if th is None:
        return None
    o0 = -(px_l // 2)  # packed-col tap offsets {o0, o0+1}

    # free reshapes: rows into pairs (leading split), W pairs into lanes
    xr = q1.reshape(n, h2, 2, w4, k2p)
    # [j=2dy+e, g=2c+p, u, co] -> [dy,e,c,p,u,co] -> [12, 2K2, CO]
    wr = wq.reshape(3, 2, 2, 2, k2, co).reshape(12, k2p, co)
    if not quant:
        wr = wr.astype(q1.dtype)
    ws_vec = (jnp.asarray(ws, jnp.float32).reshape(1, co) if ws is not None
              else jnp.ones((1, co), jnp.float32))

    grid = (n, h2 // th)

    def cur_map(ni, i):
        return (ni, i, 0, 0, 0)

    def top_map(ni, i):
        return (ni, jnp.maximum(i * th - 1, 0), 0, 0, 0)

    def bot_map(ni, i):
        return (ni, jnp.minimum((i + 1) * th, h2 - 1), 0, 0, 0)

    def blk(rows, rmap):
        return pl.BlockSpec((1, rows, 2, w4, k2p), rmap,
                            memory_space=pltpu.VMEM)

    vec = lambda: pl.BlockSpec((1, co), lambda ni, i: (0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [blk(1, top_map), blk(th, cur_map), blk(1, bot_map),
                pl.BlockSpec((12, k2p, co), lambda ni, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                vec(), vec()]
    args = [xr, xr, xr, wr, ws_vec,
            jnp.asarray(bias96, jnp.float32).reshape(1, co)]

    out_dtype = jnp.uint8 if emit_u8 else jnp.float32
    kernel = functools.partial(_kernel, th=th, o0=o0, quant=quant,
                               emit_u8=emit_u8)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w4, co), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, w4, co), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
