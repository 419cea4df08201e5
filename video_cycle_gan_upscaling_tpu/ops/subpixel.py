"""Subpixel (phase-space) convolution reforms — the TPU hot path.

Two exact graph rewrites that move the upsampling tail of the SRGAN-style
generators from HR pixel space into LR phase space:

1. ``conv_transpose_d2s``: Conv2DTranspose(stride s, SAME) computed as a
   stride-1 LR conv with a rearranged kernel producing s^2 output phases,
   then depth_to_space. XLA lowers transpose convs via input dilation
   (multiplying mostly-zeros on the MXU, ~4x waste for s=2); the phase
   form does only the real FLOPs and keeps the contraction dense.

2. ``conv_same_phase``: a stride-1 SAME conv AT HR, evaluated directly on
   the phase-packed LR tensor (C*s^2 channels). The final 9x9 conv of the
   generators maps 256->3 channels at HR — 3/128 MXU output lanes (~2%
   utilization). In phase space it becomes ceil(k/s)-tap conv with
   C*s^2 -> 3*s^2 channels at LR: same FLOPs, s^2-fold better lane
   utilization, s^2 fewer spatial positions.

Both are bit-exact reparameterizations (tested against lax.conv_transpose
/ HR conv in tests/test_subpixel.py). Kernel rearrangement happens at
trace time from the canonical parameters, so checkpoints stay in the
reference layout.

Phase layout convention: depth_to_space(x[N,H,W,C*s*s], s)[n, s*i+a,
s*j+b, c] = x[n, i, j, (a*s+b)*C + c].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def depth_to_space(x: jax.Array, s: int) -> jax.Array:
    """[N,H,W,C*s*s] -> [N,H*s,W*s,C] with (a*s+b) phase-major layout."""
    n, h, w, cs = x.shape
    c = cs // (s * s)
    x = x.reshape(n, h, w, s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, a, w, b, c
    return x.reshape(n, h * s, w * s, c)


def depth_to_space_axes(x: jax.Array, s_y: int, s_x: int) -> jax.Array:
    """[N,H,W,C*s_y*s_x] -> [N,H*s_y,W*s_x,C] with (a*s_x+b) phase-major
    layout — the asymmetric-phase generalization of depth_to_space."""
    n, h, w, cs = x.shape
    c = cs // (s_y * s_x)
    x = x.reshape(n, h, w, s_y, s_x, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * s_y, w * s_x, c)


def space_to_depth(x: jax.Array, s: int) -> jax.Array:
    """Inverse of depth_to_space (same phase layout)."""
    n, hs, ws, c = x.shape
    h, w = hs // s, ws // s
    x = x.reshape(n, h, s, w, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, w, a, b, c
    return x.reshape(n, h, w, s * s * c)


def space_to_depth_axes(x: jax.Array, s_y: int, s_x: int) -> jax.Array:
    """Inverse of depth_to_space_axes; s_x=1 folds only the H axis into
    channels (one free row-major reshape when s_y=1)."""
    n, hs, ws, c = x.shape
    h, w = hs // s_y, ws // s_x
    x = x.reshape(n, h, s_y, w, s_x, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, s_y * s_x * c)


def _transpose_pad(k: int, s: int) -> int:
    """jax.lax.conv_transpose SAME low padding (its _conv_transpose_padding)."""
    pad_len = k + s - 2
    if s > k - 1:
        return k - 1
    return int(math.ceil(pad_len / 2))


def _transpose_phase_axis(k: int, s: int):
    """Per-axis phase tap plan for the transpose conv.

    Returns (taps, Q, n): taps[a] = list of (v_prime, u) kernel placements
    for phase a; the unified conv uses kernel width n and left pad Q.
    """
    pl = _transpose_pad(k, s)
    plans = []
    qs = []
    for a in range(s):
        u0 = (pl - a) % s
        q = (pl - a - u0) // s
        us = list(range(u0, k, s))
        plans.append((q, us))
        qs.append(q)
    Q = max(qs)
    n = 0
    taps = []
    for a, (q, us) in enumerate(plans):
        d = Q - q
        t = [(v + d, u) for v, u in enumerate(us)]
        taps.append(t)
        if t:
            n = max(n, max(vp for vp, _ in t) + 1)
    return taps, Q, n


def _axis_index_map(taps, s: int, n: int, k: int) -> np.ndarray:
    """[s, n] numpy map: phase a, tap v -> kernel index u (k = zero
    sentinel)."""
    idx = np.full((s, n), k, np.int32)
    for a, t in enumerate(taps):
        for v, u in t:
            idx[a, v] = u
    return idx


def _rearrange_transpose_kernel(w: jax.Array, s: int):
    """[k,k,C,O] transpose-conv kernel -> ([ny,nx,C,O*s*s], (Qy,Qx),
    (ny,nx)) phase kernel (phase-major output channels). One gather —
    no per-tap graph ops."""
    k_y, k_x, c_in, c_out = w.shape
    taps_y, q_y, n_y = _transpose_phase_axis(k_y, s)
    taps_x, q_x, n_x = _transpose_phase_axis(k_x, s)
    iy = _axis_index_map(taps_y, s, n_y, k_y)  # [s, ny]
    ix = _axis_index_map(taps_x, s, n_x, k_x)  # [s, nx]
    w_pad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # one-hot selection einsums instead of a fancy-index gather: the
    # gather's autodiff is a serialized scatter-add on TPU (the phase
    # tail's training-graph tax, scripts/microbench_r3h.py); the einsum
    # adjoint is just the transposed einsum. The one-hot factors are
    # trace-time constants, and 0/1 multiplies keep the result exact.
    ey = jnp.asarray(np.eye(k_y + 1, dtype=np.float32)[iy], w_pad.dtype)
    ex = jnp.asarray(np.eye(k_x + 1, dtype=np.float32)[ix], w_pad.dtype)
    # g[a, vy, b, vx, C, O]
    g = jnp.einsum("ayK,bxL,KLco->aybxco", ey, ex, w_pad)
    # -> [vy, vx, C, a, b, O] -> [ny, nx, C, s*s*O]
    g = g.transpose(1, 3, 4, 0, 2, 5)
    wp = g.reshape(n_y, n_x, c_in, s * s * c_out)
    return wp, (q_y, q_x), (n_y, n_x)


def conv_transpose_d2s(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                       stride: int = 2) -> jax.Array:
    """Exact Conv2DTranspose(stride, SAME) as phase conv + depth_to_space.

    ``w`` is the canonical HWIO transpose kernel (same parameter as
    ops.nn.conv_transpose_same); output matches lax.conv_transpose SAME.
    """
    wp, (q_y, q_x), (n_y, n_x) = _rearrange_transpose_kernel(w, stride)
    y = lax.conv_general_dilated(
        x, wp.astype(x.dtype),
        window_strides=(1, 1),
        padding=((q_y, n_y - 1 - q_y), (q_x, n_x - 1 - q_x)),
        dimension_numbers=CONV_DIMS,
    )
    y = depth_to_space(y, stride)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _same_phase_axis(k: int, s: int, P: int | None = None):
    """Per-axis plan for evaluating a stride-1 HR conv (left pad ``P``,
    default SAME) in phase space.

    For output phase a and input phase c: taps u = s*t + (c - a + P) with
    t in [t_min(a,c), t_max(a,c)]. Returns (placements, t_min_g, n) where
    placements[(a, c)] = list of (v, u) with v = t - t_min_g.
    """
    if P is None:
        P = (k - 1) // 2
    t_min_g, t_max_g = 10 ** 9, -(10 ** 9)
    spans = {}
    for a in range(s):
        for c in range(s):
            base = c - a + P
            ts = [t for t in range(-(k // s) - 2, k // s + 3)
                  if 0 <= s * t + base < k]
            spans[(a, c)] = ts
            if ts:
                t_min_g = min(t_min_g, ts[0])
                t_max_g = max(t_max_g, ts[-1])
    n = t_max_g - t_min_g + 1
    placements = {}
    for (a, c), ts in spans.items():
        placements[(a, c)] = [(t - t_min_g, s * t + c - a + P) for t in ts]
    return placements, t_min_g, n


def _same_axis_index_map(placements, s: int, n: int, k: int) -> np.ndarray:
    """[s, s, n] numpy map: (out phase a, in phase c, tap v) -> kernel
    index u (k = zero sentinel)."""
    idx = np.full((s, s, n), k, np.int32)
    for (a, c), taps in placements.items():
        for v, u in taps:
            idx[a, c, v] = u
    return idx


def rearrange_same_kernel_axes(w: jax.Array, s_y: int, s_x: int,
                               P_y: int | None = None,
                               P_x: int | None = None):
    """[k,k,C,O] HR conv kernel (left pads P_y/P_x, default SAME) -> phase
    kernel [ny,nx,C*s_y*s_x,O*s_y*s_x] + padding info, with independent
    per-axis phase factors (s_y=1 leaves the H axis unpacked — the layout
    used by the fused trunk kernels, which pack W only). Single-gather
    construction; channel order (cy*s_x + cx)*C + c on both sides."""
    k_y, k_x, c_in, c_out = w.shape
    pl_y, t0_y, n_y = _same_phase_axis(k_y, s_y, P_y)
    pl_x, t0_x, n_x = _same_phase_axis(k_x, s_x, P_x)
    iy = _same_axis_index_map(pl_y, s_y, n_y, k_y)  # [ay, cy, vy]
    ix = _same_axis_index_map(pl_x, s_x, n_x, k_x)  # [bx, cx, vx]
    w_pad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    # one-hot selection einsums instead of a fancy-index gather — same
    # scatter-free-adjoint rationale as _rearrange_transpose_kernel.
    ey = jnp.asarray(np.eye(k_y + 1, dtype=np.float32)[iy], w_pad.dtype)
    ex = jnp.asarray(np.eye(k_x + 1, dtype=np.float32)[ix], w_pad.dtype)
    # g[ay, cy, vy, bx, cx, vx, C, O]
    g = jnp.einsum("acvK,bdwL,KLio->acvbdwio", ey, ex, w_pad)
    # -> [vy, vx, cy, cx, C, ay, bx, O]
    g = g.transpose(2, 5, 1, 4, 6, 0, 3, 7)
    wp = g.reshape(n_y, n_x, s_y * s_x * c_in, s_y * s_x * c_out)
    return wp, (-t0_y, n_y - 1 + t0_y), (-t0_x, n_x - 1 + t0_x)


def _rearrange_same_kernel(w: jax.Array, s: int, P_y: int | None = None,
                           P_x: int | None = None):
    """[k,k,C,O] HR conv kernel (left pads P_y/P_x, default SAME) -> phase
    kernel [ny,nx,C*s*s,O*s*s] + padding info. Single-gather construction."""
    return rearrange_same_kernel_axes(w, s, s, P_y, P_x)


def conv_same_phase(x_phase: jax.Array, w: jax.Array,
                    b: jax.Array | None = None, stride: int = 2) -> jax.Array:
    """Evaluate a stride-1 SAME HR conv on a phase-packed LR tensor.

    Equivalent to: space_to_depth(conv_hr(depth_to_space(x_phase)), s).
    """
    wp, (py_l, py_h), (px_l, px_h) = _rearrange_same_kernel(w, stride)
    y = lax.conv_general_dilated(
        x_phase, wp.astype(x_phase.dtype),
        window_strides=(1, 1),
        padding=((py_l, py_h), (px_l, px_h)),
        dimension_numbers=CONV_DIMS,
    )
    if b is not None:
        bb = jnp.tile(b, stride * stride)
        y = y + bb.astype(y.dtype)
    return y


# --------------------------------------------------------- phase-tail algebra
def renest_perm(r: int, t: int, c_out: int) -> np.ndarray:
    """Channel permutation such that renest_phases(x, r, t, c) ==
    x[..., renest_perm(r, t, c)] — renesting is a pure lane relabeling, so
    it can be folded into a conv kernel's channel axis at prepack time
    instead of copying the (potentially GB-scale) activation at runtime."""
    return (np.arange(r * r * t * t * c_out)
            .reshape(r, r, t, t, c_out)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1))


def renest_phases(x: jax.Array, r: int, t: int, c_out: int) -> jax.Array:
    """Flatten a nested phase layout into the canonical one.

    Input channels: outer r-phase blocks, each containing t-phase blocks of
    ``c_out`` channels — i.e. ((a_r*r + b_r)*t*t + a_t*t + b_t)*c_out + c,
    the layout produced by applying a phase-rearranged transpose kernel on
    an r-phase tensor. Output: canonical (A*(r*t) + B)*c_out + c with
    A = t*a_r + a_t, B = t*b_r + b_t.
    """
    n, h, w_, _ = x.shape
    y = x.reshape(n, h, w_, r, r, t, t, c_out)
    y = y.transpose(0, 1, 2, 3, 5, 4, 6, 7)  # a_r, a_t, b_r, b_t, c
    return y.reshape(n, h, w_, r * t * r * t * c_out)


def prepack_transpose_phase(w: jax.Array, stride: int, r: int):
    """Precompute the phase kernel + static plan for transpose_conv_phase.

    Run OUTSIDE jit: the kernel-rearrangement gathers constant-fold to a
    plain array once instead of re-running inside every jitted forward
    (a dominant cost of the round-1 tail, docs/PERF.md "glue").
    Returns (kernel_array, plan) with plan = (pads, renest, r, stride).
    """
    c_out = w.shape[-1]
    wp, (q_y, q_x), (n_y, n_x) = _rearrange_transpose_kernel(w, stride)
    if r == 1:
        pads = ((q_y, n_y - 1 - q_y), (q_x, n_x - 1 - q_x))
        return wp, (pads, r, stride)
    wpp, (py_l, py_h), (px_l, px_h) = _rearrange_same_kernel(
        wp, r, P_y=q_y, P_x=q_x)
    # fold the canonicalizing renest into the kernel's output channels —
    # saves a full-activation copy at runtime (renest_perm note)
    wpp = wpp[..., renest_perm(r, stride, c_out)]
    return wpp, ((((py_l, py_h), (px_l, px_h))), r, stride)


def transpose_conv_phase_packed(x_phase: jax.Array, wk: jax.Array, plan,
                                b: jax.Array | None = None) -> jax.Array:
    """Apply a prepack_transpose_phase kernel (plan is static); output is
    already in the canonical r*stride phase layout."""
    pads, r, stride = plan
    y = lax.conv_general_dilated(x_phase, wk.astype(x_phase.dtype), (1, 1),
                                 pads, dimension_numbers=CONV_DIMS)
    if b is not None:
        y = y + jnp.tile(b, r * stride * r * stride).astype(y.dtype)
    return y


def transpose_conv_phase(x_phase: jax.Array, w: jax.Array,
                         b: jax.Array | None, stride: int, r: int) -> jax.Array:
    """Conv2DTranspose(stride, SAME) applied at resolution r*LR, consumed
    and produced in phase space (canonical layouts r -> r*stride)."""
    wk, plan = prepack_transpose_phase(w, stride, r)
    return transpose_conv_phase_packed(x_phase, wk, plan, b)


def prepack_same_phase_blocked(w: jax.Array, r: int, extra_block: int = 1,
                               c_in: int | None = None):
    """Precompute the phase kernel + static plan for
    conv_same_phase_blocked (run OUTSIDE jit — see prepack_transpose_phase).
    When extra_block > 1, the input-side renest (canonical r-phase
    space_to_depth'd by extra -> nested) is folded into the kernel's input
    channels, so runtime needs only the space_to_depth itself.
    """
    S = r * extra_block
    wp, (py_l, py_h), (px_l, px_h) = _rearrange_same_kernel(w, S)
    if extra_block > 1:
        cin = c_in if c_in is not None else w.shape[-2]
        idx = renest_perm(extra_block, r, cin)
        wp = wp[:, :, np.argsort(idx), :]
    return wp, (((py_l, py_h), (px_l, px_h)), r, extra_block, w.shape[-1])


def conv_same_phase_blocked_packed(x_phase: jax.Array, wk: jax.Array, plan,
                                   b: jax.Array | None = None) -> jax.Array:
    """Apply a prepack_same_phase_blocked kernel (plan is static)."""
    pads, r, extra_block, c_out = plan
    S = r * extra_block
    if extra_block > 1:
        x_phase = space_to_depth(x_phase, extra_block)
    y = lax.conv_general_dilated(x_phase, wk.astype(x_phase.dtype), (1, 1),
                                 pads, dimension_numbers=CONV_DIMS)
    if b is not None:
        y = y + jnp.tile(b, S * S).astype(y.dtype)
    return y


def conv_same_phase_blocked(x_phase: jax.Array, w: jax.Array,
                            b: jax.Array | None, r: int,
                            extra_block: int = 1) -> jax.Array:
    """SAME HR conv on an r-phase tensor, optionally with additional
    ``extra_block`` spatial blocking (space_to_depth on the LR grid) so the
    phase conv runs at scale S = r*extra_block — more output lanes for
    few-channel heads (e.g. 9x9 256->3: 3*S^2 lanes instead of 3).
    Returns an S-phase tensor (canonical layout); caller depth_to_space's.

    space_to_depth on the LR grid nests extra phases OUTSIDE the r-phase
    blocks: channel ((ae*e+be)*r*r + (ar*r+br))*C + c with HR coord
    = r*(e*i + ae) + ar = S*i + (r*ae + ar) -> canonical via renest with
    (outer=extra, inner=r).
    """
    wk, plan = prepack_same_phase_blocked(w, r, extra_block)
    return conv_same_phase_blocked_packed(x_phase, wk, plan, b)
