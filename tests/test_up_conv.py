"""Fused up-conv kernel (ops/pallas/up_conv.py): interpret-mode kernel and
XLA fallback vs an explicit conv oracle, both dtypes, plus runner parity
(the FastOrigRunner tests in test_fused_conv.py route through it too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.ops.pallas import up_conv as upc

N, H, WP, CIN, COUT = 2, 8, 16, 8, 12
PADS_X = (0, 1)


def _oracle(x, w, dq, b, quant):
    from jax import lax

    wk = w.reshape(3, 2, CIN, COUT).astype(jnp.float32)
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), wk, (1, 1), ((1, 1), PADS_X),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if quant:
        y = y * dq[None, None, None, :]
    y = y + b[None, None, None, :]
    y = jnp.where(y < 0, 0.2 * y, y)
    if quant:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y


@pytest.mark.parametrize("interpret", [True, False])
@pytest.mark.parametrize("quant", [False, True])
def test_up_conv_fused_matches_oracle(quant, interpret):
    k = jax.random.PRNGKey(0)
    if quant:
        x = jax.random.randint(k, (N, H, WP, CIN), -127, 128, jnp.int32
                               ).astype(jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(1), (3, 2 * CIN, COUT),
                               -127, 128, jnp.int32).astype(jnp.int8)
    else:
        x = jax.random.normal(k, (N, H, WP, CIN), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 2 * CIN, COUT),
                              jnp.float32)
    dq = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (COUT,))) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(3), (COUT,)) * 0.5

    got = upc.up_conv_fused(x, w, dq, b, PADS_X, quant=quant,
                            interpret=interpret)
    ref = _oracle(x, w, dq, b, quant)
    if quant:
        assert got.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    else:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-4, atol=1e-4)


def test_plan_flagship_geometry():
    """The flagship 540p geometry must take the Pallas path with full-lane
    tiles."""
    plan = upc._plan(540, 960, 64, 1024, 3, quant=True)
    assert plan is not None
    th, co_t = plan
    assert 540 % th == 0 and co_t % 128 == 0
