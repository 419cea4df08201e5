"""Pallas TPU kernel: fused instance normalization (+ activation).

XLA's lowering of the (H,W)-axis reduction in instance norm measures
~6.7 ms per layer on [4,288,512,64] bf16 (v5e) — 4.5x the cost of a 5x5
conv on the same tensor, and the SRGAN trunk has 33 of them (SURVEY.md
north star: "InstanceNorm+ReLU folded into the conv epilogue"). This
kernel does the canonical two-pallas-pass scheme:

1. stats pass: grid (N, H-tiles); per-tile partial sum/sum-of-squares
   accumulated in f32 into a revisited [N, 2, C] output block,
2. apply pass: y = x*scale + shift with per-(n,c) scale/shift computed
   between passes (tiny [N,C] math), with the activation epilogue
   (none/relu/leaky/prelu) folded in.

Gradients: custom_vjp with the standard instance-norm backward, using
MXU-dot reductions (reductions-as-matmul) — training-fast, inference
speed-of-light. Falls back to the pure-XLA path off-TPU (CPU tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


# Test hook: force the pallas path in interpreter mode (CPU CI).
INTERPRET = False
# Perf knob: pack sub-128 channel dims into lanes via free reshape.
import os as _os
PACK_LANES = _os.environ.get("VCGU_NORM_PACK", "1") != "0"


def _pick_tile(h: int, w: int, c: int, budget_bytes: int = 1 * 1024 * 1024) -> int:
    """Largest divisor of h with tile bytes under budget (bf16)."""
    best = 1
    for th in range(1, h + 1):
        if h % th == 0 and th * w * c * 2 <= budget_bytes:
            best = th
    return best


def _stats_kernel(x_ref, out_ref):
    h = pl.program_id(1)
    xv = x_ref[0].astype(jnp.float32)  # [Th, W, C]
    s1 = jnp.sum(xv, axis=(0, 1))
    s2 = jnp.sum(xv * xv, axis=(0, 1))

    @pl.when(h == 0)
    def _():
        out_ref[0, 0, :] = s1
        out_ref[0, 1, :] = s2

    @pl.when(h > 0)
    def _():
        out_ref[0, 0, :] = out_ref[0, 0, :] + s1
        out_ref[0, 1, :] = out_ref[0, 1, :] + s2


def _apply_kernel(x_ref, scale_ref, shift_ref, alpha_ref, o_ref, *, act: str):
    xv = x_ref[0]
    sc = scale_ref[0, 0, :].astype(xv.dtype)
    sh = shift_ref[0, 0, :].astype(xv.dtype)
    y = xv * sc + sh
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act in ("leaky", "prelu"):
        a = alpha_ref[0, :].astype(y.dtype)
        # Mosaic lacks bf16 vector compares; compare in f32
        neg = y.astype(jnp.float32) < 0.0
        y = jnp.where(neg, a * y, y)
    o_ref[0] = y


def _moments_pallas(x: jax.Array):
    n, h, w, c = x.shape
    th = _pick_tile(h, w, c)
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(n, h // th),
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=INTERPRET,
    )(x)
    m = stats[:, 0, :] / (h * w)
    var = stats[:, 1, :] / (h * w) - m * m
    return m, var


def _apply_pallas(x: jax.Array, scale: jax.Array, shift: jax.Array,
                  alpha: jax.Array, act: str):
    n, h, w, c = x.shape
    th = _pick_tile(h, w, c)
    kernel = functools.partial(_apply_kernel, act=act)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(x, scale[:, None, :], shift[:, None, :], alpha[None, :])


def _moments_mxu(x: jax.Array):
    """Per-(n,c) mean/var. On TPU: reduction-as-matmul (the MXU does the
    row sum at memory bandwidth); off-TPU plain reductions compile faster."""
    n, h, w, c = x.shape
    if not _on_tpu():
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(1, 2))
        var = jnp.mean(lax.square(xf), axis=(1, 2)) - lax.square(m)
        return m, var
    xr = x.reshape(n, h * w, c)
    ones = jnp.ones((h * w,), x.dtype)
    dims = (((0,), (1,)), ((), ()))
    s1 = lax.dot_general(ones, xr, dims, preferred_element_type=jnp.float32)
    s2 = lax.dot_general(ones, xr * xr, dims, preferred_element_type=jnp.float32)
    m = s1 / (h * w)
    return m, s2 / (h * w) - m * m


def _sum_hw(x: jax.Array):
    """[N,H,W,C] -> [N,C] f32 sum (MXU dot on TPU, plain sum off-TPU)."""
    n, h, w, c = x.shape
    if not _on_tpu():
        return jnp.sum(x.astype(jnp.float32), axis=(1, 2))
    xr = x.reshape(n, h * w, c)
    ones = jnp.ones((h * w,), x.dtype)
    return lax.dot_general(ones, xr, (((0,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def batch_norm_act(x, gamma, beta, alpha, act: str = "none",
                   eps: float = 1e-5):
    """Stateless batch norm + activation: statistics over (N,H,W).

    The reference trains BatchNorm per batch (Keras training mode); this
    is that semantics without running averages — a pure function, so the
    fused jitted GAN steps stay state-free. At N=1 it coincides with
    instance norm. A compatibility path, not the hot path: plain jnp
    stats (fully differentiable), XLA fuses the elementwise epilogue.
    """
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(0, 1, 2))                   # [C]
    var = jnp.mean(lax.square(xf), axis=(0, 1, 2)) - lax.square(m)
    inv = lax.rsqrt(var + eps)
    scale = (gamma * inv).astype(x.dtype)
    shift = (beta - m * gamma * inv).astype(x.dtype)
    y = x * scale + shift
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "leaky":
        y = jnp.where(y >= 0, y, alpha.reshape(()).astype(y.dtype) * y)
    elif act == "prelu":
        y = jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def instance_norm_act(x, gamma, beta, alpha, act: str = "none",
                      eps: float = 1e-5):
    """Fused instance norm + activation.

    x [N,H,W,C]; gamma/beta [C] affine; alpha: [C] PReLU slopes when
    act='prelu', [1] slope when act='leaky', ignored otherwise (pass
    jnp.zeros). act in {'none','relu','leaky','prelu'}.
    """
    y, _ = _forward(x, gamma, beta, alpha, act, eps)
    return y


def _forward(x, gamma, beta, alpha, act, eps):
    use_pallas = _HAVE_PALLAS and (_on_tpu() or INTERPRET)
    n, h, w, c = x.shape
    # lane packing: C below the 128-lane width wastes VPU lanes and pads
    # VMEM blocks; [N,H,W,C] -> [N,H,W/p,C*p] is a free row-major reshape.
    pack = 1
    if use_pallas and PACK_LANES and c < 128 and 128 % c == 0:
        pack = 128 // c
        while pack > 1 and w % pack:
            pack //= 2
    xp = x.reshape(n, h, w // pack, c * pack) if pack > 1 else x
    if use_pallas:
        m_p, var_p = _moments_pallas(xp)
        if pack > 1:
            # fold packed stats back to per-channel: packed channel j =
            # (w mod pack)*C + c
            s1 = (m_p * (h * (w // pack))).reshape(n, pack, c).sum(axis=1)
            s2 = ((var_p + m_p * m_p) * (h * (w // pack))
                  ).reshape(n, pack, c).sum(axis=1)
            m = s1 / (h * w)
            var = s2 / (h * w) - m * m
        else:
            m, var = m_p, var_p
    else:
        m, var = _moments_mxu(x)
    inv = lax.rsqrt(var + eps)  # [N, C] f32
    scale = gamma[None, :] * inv
    shift = beta[None, :] - m * scale
    if use_pallas:
        # broadcast alpha to [C] so the kernel block shape is uniform
        alpha_c = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(-1),
                                   (x.shape[-1],))
        if pack > 1:
            y = _apply_pallas(xp, jnp.tile(scale, (1, pack)),
                              jnp.tile(shift, (1, pack)),
                              jnp.tile(alpha_c, pack), act)
            y = y.reshape(n, h, w, c)
        else:
            y = _apply_pallas(x, scale, shift, alpha_c, act)
    else:
        y = x * scale[:, None, None, :].astype(x.dtype) \
            + shift[:, None, None, :].astype(x.dtype)
        if act == "relu":
            y = jnp.maximum(y, 0)
        elif act == "leaky":
            y = jnp.where(y >= 0, y, alpha.reshape(())[None].astype(y.dtype) * y)
        elif act == "prelu":
            y = jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)
    return y, (x, gamma, beta, alpha, m, inv)


def _fwd(x, gamma, beta, alpha, act, eps):
    return _forward(x, gamma, beta, alpha, act, eps)


def _bwd(act, eps, res, dy):
    x, gamma, beta, alpha, m, inv = res
    n, h, w, c = x.shape
    M = h * w
    xhat = ((x.astype(jnp.float32) - m[:, None, None, :])
            * inv[:, None, None, :]).astype(x.dtype)
    dalpha = jnp.zeros_like(alpha)
    if act != "none":
        # reconstruct the pre-activation z = xhat*gamma + beta (cheap; no
        # extra residual tensor needed)
        z = xhat * gamma.astype(x.dtype) + beta.astype(x.dtype)
        neg = z < 0
        if act == "relu":
            dy = jnp.where(neg, 0, dy)
        elif act == "leaky":
            a = alpha.reshape(()).astype(dy.dtype)
            dy = jnp.where(neg, a * dy, dy)
        elif act == "prelu":
            a = alpha.astype(dy.dtype)
            dalpha = _sum_hw(jnp.where(neg, dy * z, 0).astype(dy.dtype)
                             ).sum(axis=0).astype(alpha.dtype)
            dy = jnp.where(neg, a * dy, dy)
    dgamma_n = _sum_hw(dy * xhat)  # [N, C] f32
    dbeta_n = _sum_hw(dy)          # [N, C] f32
    g = gamma[None, :] * inv       # [N, C] f32
    dx = (g / M)[:, None, None, :] * (
        M * dy.astype(jnp.float32) - dbeta_n[:, None, None, :]
        - xhat.astype(jnp.float32) * dgamma_n[:, None, None, :]
    )
    return (dx.astype(x.dtype), dgamma_n.sum(axis=0).astype(gamma.dtype),
            dbeta_n.sum(axis=0).astype(beta.dtype), dalpha)


instance_norm_act.defvjp(_fwd, _bwd)


# ------------------------------------------------- norm + residual-add fusion
def _apply_res_kernel(x_ref, res_ref, scale_ref, shift_ref, o_ref):
    xv = x_ref[0]
    sc = scale_ref[0, 0, :].astype(xv.dtype)
    sh = shift_ref[0, 0, :].astype(xv.dtype)
    o_ref[0] = xv * sc + sh + res_ref[0].astype(xv.dtype)


def _apply_res_pallas(x, res, scale, shift):
    n, h, w, c = x.shape
    th = _pick_tile(h, w, c)
    blk = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _apply_res_kernel,
        grid=(n, h // th),
        in_specs=[blk, blk, vec, vec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=INTERPRET,
    )(x, res, scale[:, None, :], shift[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def instance_norm_residual(x, gamma, beta, res, eps: float = 1e-5):
    """Fused ``instance_norm(x)*gamma + beta + res`` — the residual-block
    epilogue (model.py:25 Add after the post-conv BatchNorm), one pass
    instead of norm-then-add."""
    y, _ = _forward_res(x, gamma, beta, res, eps)
    return y


def _forward_res(x, gamma, beta, res, eps):
    use_pallas = _HAVE_PALLAS and (_on_tpu() or INTERPRET)
    n, h, w, c = x.shape
    pack = 1
    if use_pallas and c < 128 and 128 % c == 0:
        pack = 128 // c
        while pack > 1 and w % pack:
            pack //= 2
    xp = x.reshape(n, h, w // pack, c * pack) if pack > 1 else x
    if use_pallas:
        m_p, var_p = _moments_pallas(xp)
        if pack > 1:
            s1 = (m_p * (h * (w // pack))).reshape(n, pack, c).sum(axis=1)
            s2 = ((var_p + m_p * m_p) * (h * (w // pack))
                  ).reshape(n, pack, c).sum(axis=1)
            m = s1 / (h * w)
            var = s2 / (h * w) - m * m
        else:
            m, var = m_p, var_p
    else:
        m, var = _moments_mxu(x)
    inv = lax.rsqrt(var + eps)
    scale = gamma[None, :] * inv
    shift = beta[None, :] - m * scale
    if use_pallas:
        if pack > 1:
            rp = res.reshape(n, h, w // pack, c * pack)
            y = _apply_res_pallas(xp, rp, jnp.tile(scale, (1, pack)),
                                  jnp.tile(shift, (1, pack)))
            y = y.reshape(n, h, w, c)
        else:
            y = _apply_res_pallas(x, res, scale, shift)
    else:
        y = (x * scale[:, None, None, :].astype(x.dtype)
             + shift[:, None, None, :].astype(x.dtype) + res.astype(x.dtype))
    return y, (x, gamma, beta, m, inv)


def _fwd_res(x, gamma, beta, res, eps):
    return _forward_res(x, gamma, beta, res, eps)


def _bwd_res(eps, resids, dy):
    x, gamma, beta, m, inv = resids
    n, h, w, c = x.shape
    M = h * w
    xhat = ((x.astype(jnp.float32) - m[:, None, None, :])
            * inv[:, None, None, :]).astype(x.dtype)
    dgamma_n = _sum_hw(dy * xhat)
    dbeta_n = _sum_hw(dy)
    g = gamma[None, :] * inv
    dx = (g / M)[:, None, None, :] * (
        M * dy.astype(jnp.float32) - dbeta_n[:, None, None, :]
        - xhat.astype(jnp.float32) * dgamma_n[:, None, None, :]
    )
    return (dx.astype(x.dtype), dgamma_n.sum(axis=0).astype(gamma.dtype),
            dbeta_n.sum(axis=0).astype(beta.dtype), dy)


instance_norm_residual.defvjp(_fwd_res, _bwd_res)
