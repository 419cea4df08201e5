"""Pallas TPU kernel: fused [norm-apply epilogue ->] conv -> stats.

The round-1 profile (docs/PERF.md) showed the SRGAN trunk spending more
time in separate instance-norm passes and layout glue than in its own
convs (45 + 15 vs 51 ms/frame), with the convs themselves at 34% MXU
because a 64-in/64-out 5x5 conv fills only half the MXU's 128 contraction
lanes. This kernel closes both gaps at once; it is the "fused conv +
instance-norm" kernel named by VERDICT.md round-1 items 2-3.

Design (one pallas_call per trunk conv):

- The feature map is W-packed: [N,H,W,C] -> [N,H,W/p,C*p] with p=128//C
  (a free row-major reshape), so matmuls run with 128 contraction AND
  128 output lanes. The 5x5 conv on the packed grid is the exact
  phase-space rewrite (ops/subpixel.py rearrange_same_kernel_axes with
  s_y=1, s_x=p): KH row taps x KW packed-column taps.
- Each grid step processes TH rows of one sample. Halo rows come from
  two small "sliver" inputs whose clamped index maps fetch the 2 rows
  above/below the block; border steps mask them to zero (= SAME zero
  padding). W-halo columns are always image borders -> zeroed in-kernel.
- The *previous* layer's instance-norm apply (scale/shift computed from
  the previous kernel's stats by tiny [N,C] XLA math), its activation,
  and its residual add run as an elementwise pre-op in VMEM — so a norm
  never touches HBM as a separate pass. The residual variant also emits
  the post-add stream h' (the next block's skip).
- The conv accumulates in f32 via KH matmuls over a lane-concatenated
  window xcat [TH+KH-1, Wp, KW*Cp] (the KW taps are folded into the
  contraction dim, so the MXU accumulates them for free).
- Per-(n,c) sum / sum-of-squares of the conv output accumulate into a
  revisited [N,2,Cp] f32 output: the next layer's normalizer.
- quant='int8' runs the same dataflow with the conv input quantized to
  int8 in VMEM (static QSCALE — post-norm activations are ~unit
  variance) and int8 weights on the MXU (v5e int8 peak ~2x bf16). The
  accumulator's per-channel scales cancel in the downstream instance
  norm (ops/quant.py invariance), so no dequant bookkeeping exists and,
  unlike the round-1 turbo path, no int8 tensor ever crosses an HBM
  kernel boundary (the relayout tax identified at docs/PERF.md:76-83).

Inference-only: no VJP (training uses the modular path in norms.py).
Reference semantics covered: conv->BN(+PReLU) pairs and the residual add
of /root/reference/upscaling/upscaler/model.py:15-27.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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
from video_cycle_gan_upscaling_tpu.ops.quant import QSCALE

# VMEM working-set budget per grid step (bytes). v5e has ~16 MiB/core;
# leave headroom for Mosaic's own staging.
_VMEM_BUDGET = 13 * 1024 * 1024


def _pick_th(h: int, wp: int, cp: int, kh: int, kw: int, *, has_res: bool,
             quant: bool) -> int:
    """Largest even divisor of h whose working set fits the VMEM budget
    (None if h has no suitable divisor — caller falls back to XLA).

    The sliver index maps express halo offsets in units of the sliver
    block height (halo_lo / halo_hi rows), so th must be divisible by
    both — automatic for kh in {3,5}, a real constraint for kh >= 7."""
    halo = kh - 1
    halo_lo = halo // 2
    halo_hi = halo - halo_lo
    in_bytes = 2  # bf16 streams
    xcat_bytes = 1 if quant else 2
    best = None
    for th in range(2, h + 1, 2):
        if h % th:
            continue
        if (halo_lo and th % halo_lo) or (halo_hi and th % halo_hi):
            continue
        rows = th + halo
        x_in = (th + halo) * wp * cp * in_bytes * 2          # cur + slivers, dbuf
        res_in = x_in if has_res else 0
        xcat = rows * wp * kw * cp * xcat_bytes
        acc = th * wp * cp * 4
        y_out = th * wp * cp * 2 * 2                          # dbuf
        h_out = y_out if has_res else 0
        w_buf = kh * kw * cp * cp * (1 if quant else 2)
        total = x_in + res_in + xcat + acc + y_out + h_out + w_buf
        if total <= _VMEM_BUDGET:
            best = th
    return best


def _kernel(*refs, th: int, kh: int, kw: int, pre: str, act: str,
            quant: bool, px_l: int, qscale: float, split: bool = False,
            partial_stats: bool = False):
    """Grid (N, H//TH). refs layout (inputs then outputs):

    x_top, x_cur, x_bot, [r_top, r_cur, r_bot,] [scale, shift,] [alpha,]
    w, y_out, [h_out,] stats_out

    ``split``: process the window as two half-row chunks so half B's
    elementwise pre-op (VPU) can overlap half A's matmuls (MXU) — the
    pre-op is otherwise a serial prefix of every step, which the int8
    path exposes (its MXU time is half the bf16 path's).
    """
    it = iter(refs)
    x_top, x_cur, x_bot = next(it), next(it), next(it)
    if pre == "affine_res":
        r_top, r_cur, r_bot = next(it), next(it), next(it)
    if pre != "none":
        scale_ref, shift_ref = next(it), next(it)
    if act in ("prelu", "leaky"):
        alpha_ref = next(it)
    if quant:
        qs_ref = next(it)  # [1, Cp] per-lane activation quant scales
    w_ref = next(it)
    y_ref = next(it)
    if pre == "affine_res":
        h_ref = next(it)
    stats_ref = next(it)

    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    halo_lo = (kh - 1) // 2
    halo_hi = kh - 1 - halo_lo
    wp = y_ref.shape[2]
    cp = y_ref.shape[3]

    def pre_op(v, r=None):
        v = v.astype(jnp.float32)
        if pre == "none":
            return v
        sc = scale_ref[0, 0, :].astype(jnp.float32)
        sh = shift_ref[0, 0, :].astype(jnp.float32)
        z = v * sc + sh
        if act == "relu":
            z = jnp.maximum(z, 0.0)
        elif act in ("prelu", "leaky"):
            a = alpha_ref[0, :].astype(jnp.float32)
            z = jnp.where(z < 0.0, a * z, z)
        if pre == "affine_res":
            z = z + r.astype(jnp.float32)
        return z

    if quant:
        q = qs_ref[0, :].astype(jnp.float32)  # per-lane; folded into the
        cast = lambda z: jnp.clip(jnp.round(z * q), -127.0, 127.0
                                  ).astype(jnp.int8)  # weights' input axis
    else:
        cast = lambda z: z.astype(jnp.bfloat16)

    def xcat_of(zw):
        """KW lane-concatenated column shifts (zero at W borders)."""
        rows = zw.shape[0]
        cols = []
        zero_col = jnp.zeros((rows, 1, cp), zw.dtype)
        for dx in range(kw):
            o = dx - px_l  # input col for output col 0
            if o < 0:
                piece = jnp.concatenate(
                    [jnp.broadcast_to(zero_col, (rows, -o, cp)),
                     zw[:, : wp + o, :]], axis=1)
            elif o > 0:
                piece = jnp.concatenate(
                    [zw[:, o:, :],
                     jnp.broadcast_to(zero_col, (rows, o, cp))], axis=1)
            else:
                piece = zw
            cols.append(piece)
        return jnp.concatenate(cols, axis=-1)  # [rows, Wp, KW*Cp]

    acc_t = jnp.int32 if quant else jnp.float32
    dims = (((2,), (0,)), ((), ()))

    def dots(xcat, rows_out):
        acc = lax.dot_general(xcat[0:rows_out], w_ref[0], dims,
                              preferred_element_type=acc_t)
        for dy in range(1, kh):
            acc = acc + lax.dot_general(xcat[dy:dy + rows_out], w_ref[dy],
                                        dims, preferred_element_type=acc_t)
        return acc

    res = pre == "affine_res"
    if split and th % 2 == 0 and th >= 4:
        h1 = th // 2
        mid = h1 + halo_hi
        z_top = pre_op(x_top[0], r_top[0] if res else None)
        z_top = jnp.where(i > 0, z_top, 0.0)
        za_cur = pre_op(x_cur[0, :mid], r_cur[0, :mid] if res else None)
        zwa = jnp.concatenate([cast(z_top), cast(za_cur)], axis=0)
        acc_a = dots(xcat_of(zwa), h1)  # outs [0, h1) — MXU half A
        # half B's pre-op is independent of acc_a: schedulable on the
        # VPU while the MXU runs half A
        zb_cur = pre_op(x_cur[0, mid:], r_cur[0, mid:] if res else None)
        z_bot = pre_op(x_bot[0], r_bot[0] if res else None)
        z_bot = jnp.where(i < n_i - 1, z_bot, 0.0)
        zwb = jnp.concatenate([zwa[h1:], cast(zb_cur), cast(z_bot)], axis=0)
        acc_b = dots(xcat_of(zwb), th - h1)
        if res:
            h_ref[0] = jnp.concatenate([za_cur, zb_cur], axis=0
                                       ).astype(h_ref.dtype)
        accf = jnp.concatenate([acc_a, acc_b], axis=0).astype(jnp.float32)
    else:
        z_cur = pre_op(x_cur[0], r_cur[0] if res else None)
        z_top = pre_op(x_top[0], r_top[0] if res else None)
        z_bot = pre_op(x_bot[0], r_bot[0] if res else None)
        z_top = jnp.where(i > 0, z_top, 0.0)
        z_bot = jnp.where(i < n_i - 1, z_bot, 0.0)
        if res:
            h_ref[0] = z_cur.astype(h_ref.dtype)
        zw = jnp.concatenate([cast(z_top), cast(z_cur), cast(z_bot)], axis=0)
        accf = dots(xcat_of(zw), th).astype(jnp.float32)

    y_ref[0] = accf.astype(y_ref.dtype)

    s1 = jnp.sum(accf, axis=(0, 1))
    s2 = jnp.sum(accf * accf, axis=(0, 1))

    if partial_stats:
        # per-step partial stats: every grid step owns a distinct output
        # block, so the whole grid is free of cross-step dependencies —
        # no revisited output for Mosaic to serialize on. XLA reduces the
        # [N, H//TH, 2, Cp] partials outside the kernel (trivial bytes).
        stats_ref[0, 0, 0, :] = s1
        stats_ref[0, 0, 1, :] = s2
    else:
        @pl.when(i == 0)
        def _():
            stats_ref[0, 0, :] = s1
            stats_ref[0, 1, :] = s2

        @pl.when(i > 0)
        def _():
            stats_ref[0, 0, :] = stats_ref[0, 0, :] + s1
            stats_ref[0, 1, :] = stats_ref[0, 1, :] + s2


def fused_conv_stats(
    x: jax.Array,
    w: jax.Array,
    *,
    pads: Tuple[int, int],
    pre: str = "none",
    act: str = "none",
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    alpha: Optional[jax.Array] = None,
    res: Optional[jax.Array] = None,
    quant: bool = False,
    qscale: float = QSCALE,
    stats_mode: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """One fused trunk step: y = conv(pre(x)), stats(y); optionally h'.

    x: [N,H,Wp,Cp] bf16/f32 packed feature map (the previous conv's raw
       output for pre='affine*', or an already-normalized stream for
       pre='none').
    w: [KH, KW*Cp, Cp] phase conv matrix (bf16; int8 when quant), built by
       ``pack_conv_kernel``. ``pads``=(px_l, px_h) column pads from the
       rearrangement; row pads are ((KH-1)//2, KH//2) SAME.
    pre: 'none' | 'affine_act' (z = act(x*scale+shift)) |
         'affine_res' (z = x*scale+shift+res, also returned as h').
    scale/shift: [N,Cp] f32; alpha: [Cp] f32 (PReLU slopes, packed).
    quant: int8 conv-input quantization at static QSCALE + int8 weights.
    stats_mode: 'revisit' (accumulate into a revisited [N,2,Cp] block —
    the inner grid dim is then 'arbitrary') or 'partial' (each step
    writes its own [1,1,2,Cp] partial and the grid is fully parallel;
    XLA sums the partials). Default from $VCGU_STATS_MODE, else
    'revisit'. Both return the same summed [N,2,Cp].

    Returns (y, stats) or (y, h, stats); y [N,H,Wp,Cp] bf16,
    stats [N,2,Cp] f32 (sum, sum of squares over H*Wp per lane).
    """
    n, h, wp, cp = x.shape
    kh = w.shape[0]
    kw = w.shape[1] // cp
    px_l, px_h = pads
    assert px_l + px_h == kw - 1, (pads, kw)
    if interpret is None:
        interpret = _norms.INTERPRET
    use_pallas = _HAVE_PALLAS and (_norms._on_tpu() or interpret)
    halo_lo = (kh - 1) // 2
    halo_hi = kh - 1 - halo_lo
    th = _pick_th(h, wp, cp, kh, kw, has_res=pre == "affine_res",
                  quant=quant)
    if not use_pallas or th is None:
        return _reference(x, w, pads=pads, pre=pre, act=act, scale=scale,
                          shift=shift, alpha=alpha, res=res, quant=quant,
                          qscale=qscale)
    import os as _os

    if stats_mode is None:
        stats_mode = _os.environ.get("VCGU_STATS_MODE", "revisit")
    assert stats_mode in ("revisit", "partial"), stats_mode
    partial = stats_mode == "partial"
    # sliver index maps express the halo offset in units of the sliver
    # block height, so that height must divide th (true for kh in
    # {3,5,...}: halo_lo/halo_hi <= 2 and th is even)
    assert (halo_lo == 0 or th % halo_lo == 0) and \
        (halo_hi == 0 or th % halo_hi == 0), (th, kh)
    grid = (n, h // th)
    n_i = h // th

    def cur_map(ni, i):
        return (ni, i, 0, 0)

    def top_map(ni, i):
        # rows [i*th - halo_lo, i*th) as a Blocked(halo_lo) index, clamped
        return (ni, jnp.maximum(i * (th // halo_lo) - 1, 0), 0, 0)

    def bot_map(ni, i):
        return (ni, jnp.minimum(i * (th // halo_hi) + th // halo_hi,
                                h // halo_hi - 1), 0, 0)

    def blk(rows, rmap):
        return pl.BlockSpec((1, rows, wp, cp), rmap,
                            memory_space=pltpu.VMEM)

    in_specs = [blk(halo_lo, top_map), blk(th, cur_map), blk(halo_hi, bot_map)]
    args = [x, x, x]
    if pre == "affine_res":
        in_specs += [blk(halo_lo, top_map), blk(th, cur_map),
                     blk(halo_hi, bot_map)]
        args += [res, res, res]
    if pre != "none":
        vec = pl.BlockSpec((1, 1, cp), lambda ni, i: (ni, 0, 0),
                           memory_space=pltpu.VMEM)
        in_specs += [vec, vec]
        args += [scale[:, None, :], shift[:, None, :]]
    if act in ("prelu", "leaky"):
        in_specs += [pl.BlockSpec((1, cp), lambda ni, i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [jnp.broadcast_to(alpha.astype(jnp.float32).reshape(-1),
                                  (cp,))[None, :]]
    if quant:
        # per-lane activation quant scales ([Cp] vector; a scalar qscale
        # broadcasts — same kernel either way, so calibration never
        # triggers a recompile)
        qs = jnp.broadcast_to(jnp.asarray(qscale, jnp.float32).reshape(-1),
                              (cp,))[None, :]
        in_specs += [pl.BlockSpec((1, cp), lambda ni, i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [qs]
    in_specs += [pl.BlockSpec((kh, kw * cp, cp), lambda ni, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [w]

    out_shapes = [jax.ShapeDtypeStruct((n, h, wp, cp), jnp.bfloat16)]
    out_specs = [blk(th, cur_map)]
    if pre == "affine_res":
        out_shapes += [jax.ShapeDtypeStruct((n, h, wp, cp), jnp.bfloat16)]
        out_specs += [blk(th, cur_map)]
    if partial:
        out_shapes += [jax.ShapeDtypeStruct((n, n_i, 2, cp), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 1, 2, cp), lambda ni, i: (ni, i, 0, 0),
                                   memory_space=pltpu.VMEM)]
        semantics = ("parallel", "parallel")
    else:
        out_shapes += [jax.ShapeDtypeStruct((n, 2, cp), jnp.float32)]
        out_specs += [pl.BlockSpec((1, 2, cp), lambda ni, i: (ni, 0, 0),
                                   memory_space=pltpu.VMEM)]
        semantics = ("parallel", "arbitrary")

    split = _os.environ.get("VCGU_TRUNK_SPLIT", "0") == "1"
    kernel = functools.partial(_kernel, th=th, kh=kh, kw=kw, pre=pre,
                               act=act, quant=quant, px_l=px_l,
                               qscale=qscale, split=split,
                               partial_stats=partial)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            # Mosaic's scoped stack tops _pick_th's accounted buffers by a
            # geometry-dependent margin (measured +~80% at 270x240 where
            # the default 16M limit OOMs a th the model deems safe at
            # 9.4M); v5e has 128M physical VMEM and these kernels run
            # alone, so raise the soft scoped limit instead of shrinking
            # proven tile choices.
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    out = list(out)
    if partial:
        out[-1] = jnp.sum(out[-1], axis=1)  # [N, n_i, 2, Cp] -> [N, 2, Cp]
    return tuple(out)


def _reference(x, w, *, pads, pre, act, scale, shift, alpha, res, quant,
               qscale=QSCALE):
    """Pure-XLA fallback (CPU tests / non-TPU): same math, same outputs."""
    n, h, wp, cp = x.shape
    kh = w.shape[0]
    kw = w.shape[1] // cp
    z = x.astype(jnp.float32)
    if pre != "none":
        z = z * scale[:, None, None, :] + shift[:, None, None, :]
        if act == "relu":
            z = jnp.maximum(z, 0.0)
        elif act in ("prelu", "leaky"):
            a = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(-1), (cp,))
            z = jnp.where(z < 0.0, a * z, z)
        if pre == "affine_res":
            z = z + res.astype(jnp.float32)
    hstream = z.astype(jnp.bfloat16) if pre == "affine_res" else None
    if quant:
        qs = jnp.asarray(qscale, jnp.float32).reshape(-1)  # scalar or [Cp]
        zq = jnp.clip(jnp.round(z * qs), -127.0, 127.0).astype(jnp.int8)
        wk = w.reshape(kh, kw, cp, cp)
        y = lax.conv_general_dilated(
            zq.astype(jnp.int32), wk.astype(jnp.int32), (1, 1),
            (((kh - 1) // 2, kh // 2), (pads[0], pads[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)
    else:
        wk = w.reshape(kh, kw, cp, cp).astype(jnp.float32)
        zc = z.astype(jnp.float32)
        y = lax.conv_general_dilated(
            zc, wk, (1, 1),
            (((kh - 1) // 2, kh // 2), (pads[0], pads[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    stats = jnp.stack([jnp.sum(y, axis=(1, 2)),
                       jnp.sum(y * y, axis=(1, 2))], axis=1)
    yb = y.astype(jnp.bfloat16)
    if pre == "affine_res":
        return yb, hstream, stats
    return yb, stats


# --------------------------------------------------------------- host-side
def pack_conv_kernel(w: jax.Array, pack: int, quant: bool = False,
                     raw: bool = False):
    """[k,k,C,C] canonical SAME conv kernel -> ([KH, KW*Cp, Cp], pads) for
    fused_conv_stats, with the W axis phase-packed by ``pack``. Run OUTSIDE
    jit (prepack time): the gather is constant-folded to a plain array.
    ``raw``: return the f32 matrix unquantized/uncast (the calibration
    master for per-channel refolds — see quantize_packed_kernel)."""
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    wp_, (py_l, py_h), (px_l, px_h) = sp.rearrange_same_kernel_axes(
        w, 1, pack)
    kh, kw, ci, co = wp_.shape
    assert (py_l, py_h) == ((w.shape[0] - 1) // 2, w.shape[0] // 2)
    mat = wp_.reshape(kh, kw * ci, co)
    if raw:
        return mat.astype(jnp.float32), (px_l, px_h)
    if quant:
        mat = quantize_packed_kernel(mat)
    else:
        mat = mat.astype(jnp.bfloat16)
    return mat, (px_l, px_h)


def quantize_packed_kernel(mat, in_scales=None, out_pack: int = 1):
    """Symmetric per-out-CHANNEL int8 quantization of a packed [KH,
    KW*Cp, Cp] conv matrix; the scales are NOT returned — consumers feed
    InstanceNorm, where per-out-channel scales cancel (ops/quant.py).

    ``in_scales``: optional per-input-LANE activation quant scales [Cp]
    to fold into the matrix first (tiled across the KW taps), so
    per-channel activation quantization costs nothing at runtime.
    ``out_pack``: W-pack factor of the OUTPUT lanes (Cp = out_pack*C,
    lane order (wslot*C + c)). The quant scale must be shared across the
    pack slots of one channel — stats_to_scale_shift SUMS packed stats
    per channel, so per-slot scales would mix differently-scaled
    streams and break the InstanceNorm cancellation (measured: a
    per-lane-scaled fold cost ~18 dB end-to-end)."""
    import numpy as np

    mat = np.asarray(mat, np.float32)
    if in_scales is not None:
        kw = mat.shape[1] // mat.shape[2]
        mat = mat / np.tile(np.asarray(in_scales, np.float32),
                            kw)[None, :, None]
    cp = mat.shape[2]
    c = cp // out_pack
    amax = np.max(np.abs(mat.reshape(mat.shape[0], mat.shape[1],
                                     out_pack, c)), axis=(0, 1, 2))
    amax = np.tile(amax, out_pack)[None, None, :]
    s = 127.0 / np.maximum(amax, 1e-8)
    return jnp.asarray(np.clip(np.round(mat * s), -127, 127), jnp.int8)


def stats_to_scale_shift(stats: jax.Array, gamma: jax.Array, beta: jax.Array,
                         pack: int, hw: int, eps: float = 1e-5):
    """[N,2,Cp] packed stats -> per-(n,c) instance-norm apply params,
    tiled back to Cp lanes. gamma/beta are the canonical [C] affines."""
    n, _, cp = stats.shape
    c = cp // pack
    s1 = stats[:, 0, :].reshape(n, pack, c).sum(axis=1)
    s2 = stats[:, 1, :].reshape(n, pack, c).sum(axis=1)
    m = s1 / hw
    var = s2 / hw - m * m
    inv = lax.rsqrt(var + eps)
    scale = gamma[None, :] * inv
    shift = beta[None, :] - m * scale
    if pack > 1:
        scale = jnp.tile(scale, (1, pack))
        shift = jnp.tile(shift, (1, pack))
    return scale, shift
