"""Pallas fused kernel: instance-norm(+act)(+residual) with int8 output.

Inference-only companion to ops/pallas/norms.py for the W8A8 trunk
(ops/quant.py): consumes the raw int32 conv accumulator (whose
per-channel scale/bias cancel in the normalization), applies the affine +
activation in f32, folds the residual add in the integer domain, and
emits int8 at the static post-norm scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from video_cycle_gan_upscaling_tpu.ops.pallas import norms as _norms
from video_cycle_gan_upscaling_tpu.ops.quant import QSCALE

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _apply_quant_kernel(*refs, act: str, out_scale: float, has_res: bool):
    if has_res:
        x_ref, scale_ref, shift_ref, alpha_ref, res_ref, rs_ref, o_ref = refs
    else:
        x_ref, scale_ref, shift_ref, alpha_ref, o_ref = refs
        res_ref = rs_ref = None
    # bf16 vector math throughout (full VPU rate); int8 rounding tolerates
    # bf16 granularity (<=0.5 ulp at |q|<=127). Compares must be f32.
    xv = x_ref[0]
    ct = xv.dtype if xv.dtype == jnp.bfloat16 else jnp.float32
    xv = xv.astype(ct)
    sc = scale_ref[0, 0, :].astype(ct)
    sh = shift_ref[0, 0, :].astype(ct)
    y = xv * sc + sh
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act in ("leaky", "prelu"):
        a = alpha_ref[0, :].astype(ct)
        y = jnp.where(y.astype(jnp.float32) < 0.0, a * y, y)
    q = y * jnp.asarray(out_scale, ct)
    if has_res:
        q = q + res_ref[0].astype(ct) * rs_ref[0, 0].astype(ct)
    # Mosaic can't round bf16 vectors (math.roundeven) — round/clip in f32
    q = jnp.clip(jnp.round(q.astype(jnp.float32)), -127.0, 127.0)
    o_ref[0] = q.astype(jnp.int8)


def instance_norm_act_quant(acc: jax.Array, gamma: jax.Array, beta: jax.Array,
                            alpha: jax.Array, act: str = "none",
                            out_scale: float = QSCALE,
                            residual: jax.Array | None = None,
                            res_rescale=1.0,
                            eps: float = 1e-5) -> jax.Array:
    """IN(acc)*gamma+beta -> act -> (+ residual int8) -> int8.

    ``acc``: int32 conv accumulator (or any float) [N,H,W,C]; scales/
    biases of the producing conv cancel in the normalization. ``residual``
    int8 at ``out_scale/res_rescale``; ``res_rescale`` may be a traced
    scalar (e.g. out_scale / dynamic stem scale).
    """
    n, h, w, c = acc.shape
    use_pallas = _HAVE_PALLAS and (_norms._on_tpu() or _norms.INTERPRET)
    # lane packing (free row-major reshape): int8/bf16 tiles with C<128
    # lanes waste most of the VPU and VMEM
    pack = 1
    if use_pallas and c < 128 and 128 % c == 0:
        pack = 128 // c
        while pack > 1 and w % pack:
            pack //= 2
    if use_pallas:
        accp = acc.reshape(n, h, w // pack, c * pack) if pack > 1 else acc
        m_p, var_p = _norms._moments_pallas(accp)
        if pack > 1:
            hw = h * (w // pack)
            s1 = (m_p * hw).reshape(n, pack, c).sum(axis=1)
            s2 = ((var_p + m_p * m_p) * hw).reshape(n, pack, c).sum(axis=1)
            m = s1 / (h * w)
            var = s2 / (h * w) - m * m
        else:
            m, var = m_p, var_p
    else:
        accf = acc.astype(jnp.float32)
        m = jnp.mean(accf, axis=(1, 2))
        var = jnp.mean(lax.square(accf), axis=(1, 2)) - lax.square(m)
    inv = lax.rsqrt(var + eps)
    scale = gamma[None, :].astype(jnp.float32) * inv
    shift = beta[None, :].astype(jnp.float32) - m * scale
    alpha_c = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(-1), (c,))

    if not use_pallas:
        y = acc.astype(jnp.float32) * scale[:, None, None, :] + shift[:, None, None, :]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act in ("leaky", "prelu"):
            y = jnp.where(y < 0, alpha_c * y, y)
        q = y * out_scale
        if residual is not None:
            q = q + residual.astype(jnp.float32) * jnp.asarray(res_rescale, jnp.float32)
        return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)

    wp, cp = w // pack, c * pack
    if pack > 1:
        scale = jnp.tile(scale, (1, pack))
        shift = jnp.tile(shift, (1, pack))
        alpha_c = jnp.tile(alpha_c, pack)
    th = _norms._pick_tile(h, wp, cp)
    blk = pl.BlockSpec((1, th, wp, cp), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, cp), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    avec = pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    has_res = residual is not None
    kernel = functools.partial(_apply_quant_kernel, act=act,
                               out_scale=float(out_scale),
                               has_res=has_res)
    scal = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, vec, vec, avec] + ([blk, scal] if has_res else [])
    args = [accp, scale[:, None, :], shift[:, None, :], alpha_c[None, :]]
    if has_res:
        args.append(residual.reshape(n, h, wp, cp))
        args.append(jnp.asarray(res_rescale, jnp.float32).reshape(1, 1))
    out = pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, h, wp, cp), jnp.int8),
        interpret=_norms.INTERPRET,
    )(*args)
    return out.reshape(n, h, w, c)
