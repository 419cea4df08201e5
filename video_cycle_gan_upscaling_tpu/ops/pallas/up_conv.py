"""Pallas TPU kernel: the phase-space upsampling transpose conv of the
inference tail, with the dequant -> bias -> LeakyReLU -> requant epilogue
fused in.

The flagship ×2 tail's transpose conv is a [3,3,64,1024] stride-1 phase
conv on the UNPACKED trunk stream (ops/subpixel.py transpose rearrange
of the 5x5/s2 kernel). XLA previously ran it W-pair-packed as
[3,3,128,2048] (~4.5 ms/frame at 540p on v5e, docs/PERF.md); that pack
doubles the contraction work (K = KW*2C = 384/row-tap vs 192), which
only paid off under XLA's conv lowering. This kernel keeps the unpacked
form — KH row-tap matmuls over a lane-concatenated KW window
(K = KW*Cin = 192, the dataflow of ops/pallas/fused_conv.py) — and
computes the elementwise tail epilogue in VMEM, so the giant phase
intermediate crosses HBM exactly once, already in its final dtype.
(The W-pair fold to the head's [.,W/2,8C] layout is a free row-major
reshape of this kernel's output.)

Grid: (N, H//TH, CO_TILES) — all dims parallel (every step owns a
distinct output block; halo rows come from clamped sliver inputs). The
output-channel tiling keeps the f32 accumulator inside VMEM; the input
blocks revisit across consecutive co steps so Mosaic re-uses them.

Variants:
- quant: x int8 (pre-quantized by the caller at scale s0), w int8
  per-out-channel scales; epilogue q1 = round(leaky(acc*dq + b)*...) as
  int8 with s1 folded into dq/b by the caller (LeakyReLU is positively
  homogeneous, so the s1 scaling commutes through it).
- bf16: x bf16, w bf16, f32 accumulate, epilogue y1 = leaky(acc + b) as
  bf16.

Reference semantics: the upsampling Conv2DTranspose + LeakyReLU stage of
/root/reference/upscaling/upscaler/model.py:70-75, 287-288, evaluated
per ops/subpixel.py's phase algebra.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

from video_cycle_gan_upscaling_tpu.ops.pallas import norms as _norms

# Mosaic's scoped stack tops the accounted buffers by ~one acc-sized f32
# epilogue temporary (measured: 18.85M actual vs 12.4M accounted at
# th=12/co_t=128 on v5e) — _plan counts acc twice and keeps 2M headroom
# under the 16M scoped limit.
_VMEM_BUDGET = 14 * 1024 * 1024


def _plan(h: int, wp: int, cin: int, cout: int, kw: int, quant: bool,
          xb: int = 2):
    """Pick (th, co_t) fitting the VMEM budget — largest th (DMA
    efficiency; the x blocks revisit across co steps), then largest co_t.
    None if nothing fits (caller falls back to XLA). ``xb`` = input
    bytes/elem (1 int8, 2 bf16, 4 f32)."""
    if quant:
        xb = 1

    def fits(th, co_t):
        rows = th + 2
        x_in = (th + 2) * wp * cin * xb * 2          # cur+slivers, dbuf
        xcat = rows * wp * kw * cin * xb
        acc = th * wp * co_t * 4 * 2                 # + f32 epilogue temp
        y_out = th * wp * co_t * (1 if quant else xb) * 2
        w_buf = 3 * kw * cin * co_t * xb * 2
        vecs = 4 * co_t * 4
        return x_in + xcat + acc + y_out + w_buf + vecs <= _VMEM_BUDGET

    cands = [c for c in (128, 256, 512) if cout % c == 0]
    if not cands:
        cands = [cout]  # small models (tests); lanes pad in interpret/TPU
    best = None
    for co_t in cands:
        for th in range(2, h + 1, 2):
            if h % th or not fits(th, co_t):
                continue
            if best is None or (th, co_t) > best:
                best = (th, co_t)
    return best


def _kernel(x_top, x_cur, x_bot, w_ref, dq_ref, b_ref, y_ref, *,
            th: int, kw: int, px_l: int, quant: bool, alpha: float):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    wp = y_ref.shape[2]
    cin = x_cur.shape[3]

    zdt = x_cur.dtype
    top = jnp.where(i > 0, x_top[0].astype(jnp.float32), 0.0).astype(zdt)
    bot = jnp.where(i < n_i - 1, x_bot[0].astype(jnp.float32), 0.0
                    ).astype(zdt)
    zw = jnp.concatenate([top, x_cur[0], bot], axis=0)  # [th+2, wp, cin]

    rows = zw.shape[0]
    zero_col = jnp.zeros((rows, 1, cin), zw.dtype)
    cols = []
    for dx in range(kw):
        o = dx - px_l
        if o < 0:
            piece = jnp.concatenate(
                [jnp.broadcast_to(zero_col, (rows, -o, cin)),
                 zw[:, : wp + o, :]], axis=1)
        elif o > 0:
            piece = jnp.concatenate(
                [zw[:, o:, :],
                 jnp.broadcast_to(zero_col, (rows, o, cin))], axis=1)
        else:
            piece = zw
        cols.append(piece)
    xcat = jnp.concatenate(cols, axis=-1)  # [rows, wp, kw*cin]

    acc_t = jnp.int32 if quant else jnp.float32
    dims = (((2,), (0,)), ((), ()))
    acc = lax.dot_general(xcat[0:th], w_ref[0], dims,
                          preferred_element_type=acc_t)
    for ky in (1, 2):
        acc = acc + lax.dot_general(xcat[ky:ky + th], w_ref[ky], dims,
                                    preferred_element_type=acc_t)

    y = acc.astype(jnp.float32)
    if quant:
        y = y * dq_ref[0][None, None, :]
    y = y + b_ref[0][None, None, :]
    y = jnp.where(y < 0.0, alpha * y, y)
    if quant:
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
    y_ref[0] = y.astype(y_ref.dtype)


def up_conv_fused(x: jax.Array, w: jax.Array, dq, b: jax.Array,
                  pads_x: Tuple[int, int], *, quant: bool,
                  alpha: float = 0.2, interpret=None) -> jax.Array:
    """y = requant(leaky(conv(x, w)*dq + b)).

    x: [N,H,Wp,Cin] int8 (quant) or bf16/f32; the (unpacked) trunk
       stream.
    w: [3, KW*Cin, Cout] int8/bf16/f32 phase kernel matrix (the
       prepacked [3,KW,Cin,Cout] transpose-rearranged kernel, reshaped);
       row pads are (1,1) SAME, ``pads_x`` the column pads from the
       phase rearrangement (px_l + px_h == KW - 1).
    dq: [Cout] f32 dequant scales with the requant scale s1 folded in
        (quant mode; ignored otherwise), b: [Cout] f32 bias (times s1 in
        quant mode).

    Returns [N,H,Wp,Cout] int8 (quant) or x.dtype.
    """
    n, h, wp, cin = x.shape
    assert w.shape[0] == 3 and w.shape[1] % cin == 0, (w.shape, cin)
    kw = w.shape[1] // cin
    cout = w.shape[2]
    px_l, px_h = pads_x
    assert px_l + px_h == kw - 1, (pads_x, kw)
    if interpret is None:
        interpret = _norms.INTERPRET
    use_pallas = _HAVE_PALLAS and (_norms._on_tpu() or interpret)
    plan = _plan(h, wp, cin, cout, kw, quant, xb=x.dtype.itemsize)
    if not use_pallas or plan is None:
        return _reference(x, w, dq, b, pads_x, quant=quant, alpha=alpha,
                          out_dtype=jnp.int8 if quant else x.dtype)
    th, co_t = plan
    grid = (n, h // th, cout // co_t)

    def cur_map(ni, i, co):
        return (ni, i, 0, 0)

    def top_map(ni, i, co):
        return (ni, jnp.maximum(i * th - 1, 0), 0, 0)

    def bot_map(ni, i, co):
        return (ni, jnp.minimum(i * th + th, h - 1), 0, 0)

    def blk(rows, rmap):
        return pl.BlockSpec((1, rows, wp, cin), rmap,
                            memory_space=pltpu.VMEM)

    in_specs = [
        blk(1, top_map), blk(th, cur_map), blk(1, bot_map),
        pl.BlockSpec((3, kw * cin, co_t), lambda ni, i, co: (0, 0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_t), lambda ni, i, co: (0, co),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co_t), lambda ni, i, co: (0, co),
                     memory_space=pltpu.VMEM),
    ]
    out_dtype = jnp.int8 if quant else x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, kw=kw, px_l=px_l, quant=quant,
                          alpha=alpha),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, wp, co_t),
                               lambda ni, i, co: (ni, i, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x,
      x,
      x,
      w,
      jnp.asarray(dq, jnp.float32).reshape(1, cout) if dq is not None
      else jnp.zeros((1, cout), jnp.float32),
      jnp.asarray(b, jnp.float32).reshape(1, cout))
    return out


def _reference(x, w, dq, b, pads_x, *, quant: bool, alpha: float,
               out_dtype=jnp.bfloat16):
    """Pure-XLA fallback (CPU tests / non-TPU): same math, same outputs."""
    cin = x.shape[-1]
    cout = w.shape[-1]
    wk = w.reshape(3, w.shape[1] // cin, cin, cout)
    if quant:
        acc = lax.conv_general_dilated(
            x.astype(jnp.int32), wk.astype(jnp.int32), (1, 1),
            ((1, 1), pads_x),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
        y = acc * jnp.asarray(dq, jnp.float32)[None, None, None, :]
    else:
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), wk.astype(jnp.float32), (1, 1),
            ((1, 1), pads_x),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + jnp.asarray(b, jnp.float32)[None, None, None, :]
    y = jnp.where(y < 0.0, alpha * y, y)
    if quant:
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    return y.astype(out_dtype)
