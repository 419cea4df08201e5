"""Oracle tests for the fused pair up-conv kernel (ops/pallas/pair_conv).

The Pallas kernel (interpret mode on CPU) must match the pure-XLA
reference chain — requant -> int8 conv (int32 accumulate) -> dequant +
bias + LeakyReLU [-> requant] — bit-exactly on the int8 paths (integer
accumulation is associative; the f32 epilogues apply the same ops in
the same order), and to bf16 tolerance on the bf16 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.ops.pallas import pair_conv as pc

NY, NX = 3, 2
PADS = ((1, 1), (0, 1))


def _mk(h=12, w2=8, k2=16, co=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w2, k2)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (NY, NX, k2, co)), jnp.int8)
    in_s = jnp.asarray(rng.uniform(20, 80, (k2,)), jnp.float32)
    w_s = jnp.asarray(rng.uniform(1e-4, 1e-2, (co,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    out_s = jnp.asarray(rng.uniform(20, 80, (co,)), jnp.float32)
    return x, wq, in_s, w_s, b, out_s


@pytest.mark.parametrize("out_int8", [False, True])
def test_int8_kernel_matches_reference(out_int8):
    x, wq, in_s, w_s, b, out_s = _mk()
    kw = dict(pads=PADS, w_scales=w_s, bias=b, in_scales=in_s,
              out_scales=out_s if out_int8 else None)
    got = pc.pair_conv_fused(x, wq, interpret=True, **kw)
    ref = pc._reference(x, wq, negative_slope=0.2, **kw)
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_bf16_kernel_matches_reference():
    x, wq, in_s, w_s, b, out_s = _mk()
    wf = jnp.asarray(np.asarray(wq, np.float32) * 0.01, jnp.bfloat16)
    kw = dict(pads=PADS, w_scales=None, bias=b, in_scales=None,
              out_scales=None)
    got = pc.pair_conv_fused(x, wf, interpret=True, **kw)
    ref = pc._reference(x, wf, negative_slope=0.2, **kw)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("pads_y,ny", [((0, 1), 2), ((1, 0), 2),
                                       ((1, 1), 3), ((2, 0), 3)])
@pytest.mark.parametrize("out_int8", [False, True])
@pytest.mark.parametrize("zp", [False, True])
def test_int8_input_asymmetric_pads(pads_y, ny, out_int8, zp):
    """Pre-quantized int8 input (the exact-phase stage-1 case) with the
    per-phase kernels' asymmetric row supports must match the XLA
    reference bit-exactly; ``zp``: asymmetric (zero-point) int8 emit."""
    if zp and not out_int8:
        pytest.skip("zp requires the int8 emit")
    rng = np.random.default_rng(3)
    h, w2, k2, co = 12, 8, 16, 32
    x = jnp.asarray(rng.integers(-127, 128, (2, h, w2, k2)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (ny, 2, k2, co)), jnp.int8)
    w_s = jnp.asarray(rng.uniform(1e-4, 1e-2, (co,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    out_s = jnp.asarray(rng.uniform(20, 80, (co,)), jnp.float32)
    out_zp = (jnp.asarray(rng.integers(-500, 500, (co,)), jnp.float32)
              if zp else None)
    kw = dict(pads=(pads_y, (0, 1)), w_scales=w_s, bias=b, in_scales=None,
              out_scales=out_s if out_int8 else None, out_zp=out_zp)
    got = pc.pair_conv_fused(x, wq, interpret=True, **kw)
    ref = pc._reference(x, wq, negative_slope=0.2, **kw)
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_uneven_rows_fall_back_or_split():
    # h with an odd divisor still works (th divides h, halos are 1 row)
    x, wq, in_s, w_s, b, _ = _mk(h=9)
    kw = dict(pads=PADS, w_scales=w_s, bias=b, in_scales=in_s,
              out_scales=None)
    got = pc.pair_conv_fused(x, wq, interpret=True, **kw)
    ref = pc._reference(x, wq, negative_slope=0.2, **kw)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
