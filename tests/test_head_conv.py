"""Exact-algebra test for the stride-(2,2) S=(4,8) head conv
(ops/head_conv.py): integer weights/inputs make the phase rearrangement
exactly checkable against a dense 9x9 SAME conv on the reconstructed HR
tensor."""

import numpy as np

import jax.numpy as jnp
from jax import lax

from video_cycle_gan_upscaling_tpu.ops import head_conv as hc
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

C_UP = 8
H, W2 = 6, 8  # q1 layout rows/cols; HR 12 x 32


def _hr_from_packed(q):
    """Reconstruct the HR tensor V[y, x, o] the up-conv layout
    represents: channel u = cx*(4c) + (a*2+b)*c + o at (row, w4) ->
    V[2*row + a, 4*w4 + 2*cx + b, o]."""
    _, h, w4, cu = q.shape
    c = cu // 8
    v = np.zeros((1, 2 * h, 4 * w4, c), np.float32)
    for u in range(cu):
        o = u % c
        t = u // c
        cx, rem = t // 4, t % 4
        a, b = rem // 2, rem % 2
        for row in range(h):
            for x4 in range(w4):
                v[0, 2 * row + a, 4 * x4 + 2 * cx + b, o] = q[0, row, x4, u]
    return v


def test_head_s48_matches_dense_hr_conv():
    rng = np.random.default_rng(0)
    q = rng.integers(-5, 6, (1, H, W2, 8 * C_UP)).astype(np.int8)
    w9 = rng.integers(-3, 4, (9, 9, C_UP, 3)).astype(np.float32)
    bias = rng.normal(size=(3,)).astype(np.float32) * 0.1

    v = _hr_from_packed(q)
    ref = lax.conv_general_dilated(
        jnp.asarray(v), jnp.asarray(w9), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.tanh(ref + bias[None, None, None, :])

    wd, px = hc.prepack_head_s48(jnp.asarray(w9), C_UP)
    got = hc.head_conv_s48(jnp.asarray(q), wd.astype(jnp.int8),
                           jnp.ones((96,), jnp.float32),
                           jnp.tile(jnp.asarray(bias), 32), px)
    got_hr = sp.depth_to_space_axes(got, 4, 8)
    assert got_hr.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
