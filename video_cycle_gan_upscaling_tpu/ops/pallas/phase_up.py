"""One-pass exact-phase up-conv kernel (the x4 stage-1 transpose conv).

The exact-phase stage-1 (models/fast_infer.py) runs four per-phase XLA
convs on the int8 canonical stream — true 25C taps/HR-pixel, but the
input crosses HBM four times (once per conv) and each conv runs ~65% of
the int8 roofline (scripts/microbench_r3i.py: 7.24 ms/f vs 4.14 ideal
at x4). This kernel computes ALL FOUR phases per row-block in one VMEM
pass:

    load int8 canonical rows (1-row sliver halos)
    -> 3 column-shift windows (zero at W borders)
    -> 25 tap matmuls (one [C,C'] int8 matmul per true tap, int32
       accumulate into its phase's accumulator)
    -> per-phase dequant + bias + LeakyReLU + requant (or bf16 emit)
    -> 4 separate phase outputs (the per-phase head convs consume them
       directly — the concatenated HR stream never materializes)

so the input crosses HBM exactly once. Same sliver-halo independent-
grid-step structure as ops/pallas/pair_conv.py.

Reference semantics: the upsampling Conv2DTranspose + LeakyReLU of
/root/reference/upscaling/upscaler/model.py:70-75, 287-288, evaluated
per-output-phase at its true tap support.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

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


def _pick_th(h: int, w: int, c: int, co: int, out_int8: bool
             ) -> Optional[int]:
    ob = 1 if out_int8 else 2
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        x_in = (th + 2) * w * c * 2        # cur+slivers int8, dbuf
        shifts = 3 * (th + 2) * w * c      # column windows
        acc = 4 * th * w * co * 4
        y_out = 4 * th * w * co * ob * 2   # dbuf
        w_buf = 25 * c * co
        if x_in + shifts + acc + y_out + w_buf + 12 * co * 4 \
                <= _VMEM_BUDGET:
            best = th
    return best


def _kernel(*refs, th: int, taps: Tuple[Tuple[int, int, int], ...],
            out_int8: bool, slope: float):
    """refs: x_top, x_cur, x_bot, w, ws, b, [s1,] y0..y3.
    taps: static ((ph, oy, ox), ...) with oy/ox in {-1,0,1}."""
    it = iter(refs)
    x_top, x_cur, x_bot = next(it), next(it), next(it)
    w_ref = next(it)
    ws_ref = next(it)
    b_ref = next(it)
    s1_ref = next(it) if out_int8 else None
    y_refs = [next(it) for _ in range(4)]

    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    w_ = x_cur.shape[2]
    c = x_cur.shape[3]

    z_top = jnp.where(i > 0, x_top[0].astype(jnp.float32), 0.0)
    z_bot = jnp.where(i < n_i - 1, x_bot[0].astype(jnp.float32), 0.0)
    zdt = x_cur.dtype
    zw = jnp.concatenate(
        [z_top.astype(zdt), x_cur[0], z_bot.astype(zdt)], axis=0)

    zero_col = jnp.zeros((zw.shape[0], 1, c), zw.dtype)
    shifts = {}
    for ox in (-1, 0, 1):
        if ox == -1:
            shifts[ox] = jnp.concatenate([zero_col, zw[:, : w_ - 1, :]],
                                         axis=1)
        elif ox == 1:
            shifts[ox] = jnp.concatenate([zw[:, 1:, :], zero_col], axis=1)
        else:
            shifts[ox] = zw

    dims = (((2,), (0,)), ((), ()))
    accs = [None] * 4
    for t, (ph, oy, ox) in enumerate(taps):
        part = lax.dot_general(shifts[ox][1 + oy:1 + oy + th], w_ref[t],
                               dims, preferred_element_type=jnp.int32)
        accs[ph] = part if accs[ph] is None else accs[ph] + part

    for ph in range(4):
        y = accs[ph].astype(jnp.float32) * ws_ref[ph, :] + b_ref[ph, :]
        y = jnp.where(y < 0.0, slope * y, y)
        if out_int8:
            y = jnp.clip(jnp.round(y * s1_ref[ph, :]), -127.0, 127.0)
            y_refs[ph][0] = y.astype(jnp.int8)
        else:
            y_refs[ph][0] = y.astype(y_refs[ph].dtype)


def phase_up_fused(
    q0: jax.Array,
    w_taps: jax.Array,
    taps: Sequence[Tuple[int, int, int]],
    ws4: jax.Array,
    b4: jax.Array,
    s1_4: Optional[jax.Array] = None,
    *,
    negative_slope: float = 0.2,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Optional[List[jax.Array]]:
    """Four phase parts of LeakyReLU(conv(q0) * ws + b) [* s1 -> int8].

    q0: [N,H,W,C] int8 canonical stream (stage-0 already quantized).
    w_taps: [T,C,CO] int8 — one matrix per true tap.
    taps: static (ph, oy, ox) per tap row, offsets in {-1,0,1}.
    ws4/b4[/s1_4]: [4,CO] f32 per-phase epilogue vectors.

    Returns [part0..part3] each [N,H,W,CO] (int8 if s1_4 given, else
    ``out_dtype``), or None when unsupported (caller keeps the XLA
    form).
    """
    n, h, w_, c = q0.shape
    t_, cw, co = w_taps.shape
    assert cw == c and t_ == len(taps), (w_taps.shape, len(taps))
    if q0.dtype != jnp.int8:
        return None
    if any(abs(oy) > 1 or abs(ox) > 1 for _, oy, ox in taps):
        return None
    if interpret is None:
        interpret = _norms.INTERPRET
    if not (_HAVE_PALLAS and (_norms._on_tpu() or interpret)):
        return None
    out_int8 = s1_4 is not None
    th = _pick_th(h, w_, c, co, out_int8)
    if th is None:
        return None

    grid = (n, h // th)

    def cur_map(ni, i):
        return (ni, i, 0, 0)

    def top_map(ni, i):
        return (ni, jnp.maximum(i * th - 1, 0), 0, 0)

    def bot_map(ni, i):
        return (ni, jnp.minimum((i + 1) * th, h - 1), 0, 0)

    def blk(rows, rmap):
        return pl.BlockSpec((1, rows, w_, c), rmap,
                            memory_space=pltpu.VMEM)

    vec4 = lambda: pl.BlockSpec((4, co), lambda ni, i: (0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [blk(1, top_map), blk(th, cur_map), blk(1, bot_map),
                pl.BlockSpec((t_, c, co), lambda ni, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                vec4(), vec4()]
    args = [q0, q0, q0, w_taps,
            jnp.asarray(ws4, jnp.float32).reshape(4, co),
            jnp.asarray(b4, jnp.float32).reshape(4, co)]
    if out_int8:
        in_specs.append(vec4())
        args.append(jnp.asarray(s1_4, jnp.float32).reshape(4, co))

    odt = jnp.int8 if out_int8 else out_dtype
    out_specs = tuple(
        pl.BlockSpec((1, th, w_, co), cur_map, memory_space=pltpu.VMEM)
        for _ in range(4))
    out_shape = tuple(
        jax.ShapeDtypeStruct((n, h, w_, co), odt) for _ in range(4))
    kernel = functools.partial(_kernel, th=th, taps=tuple(taps),
                               out_int8=out_int8, slope=negative_slope)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return list(outs)
