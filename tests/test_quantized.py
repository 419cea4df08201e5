"""W8A8 turbo path: component exactness + end-to-end quality vs bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
from video_cycle_gan_upscaling_tpu.models.quantized import (
    quantize_orig_params,
    quantized_orig_apply,
)
from video_cycle_gan_upscaling_tpu.ops import quant
from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms
from video_cycle_gan_upscaling_tpu.ops.pallas.quant_norms import instance_norm_act_quant
from video_cycle_gan_upscaling_tpu.video.metrics import psnr


def test_weight_quantization_per_channel():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8)) * \
        jnp.arange(1, 9)[None, None, None, :]  # very different channel scales
    q = quant.quantize_weights(w)
    assert q.dtype == jnp.int8
    # every output channel should use the full int8 range
    assert int(jnp.min(jnp.max(jnp.abs(q.astype(jnp.int32)), axis=(0, 1, 2)))) >= 126


def test_dynamic_activation_quantization_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    q, s = quant.quantize_activations_dynamic(x)
    back = q.astype(jnp.float32) / s
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=float(1.0 / s) + 1e-6)


def test_conv_int8_matches_f32_conv():
    key = jax.random.PRNGKey(2)
    x = jax.random.randint(key, (1, 8, 8, 4), -127, 127, jnp.int8)
    w = jax.random.randint(jax.random.PRNGKey(3), (3, 3, 4, 8), -127, 127, jnp.int8)
    acc = quant.conv_int8(x, w)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref).astype(np.int32))


def test_norm_invariance_to_conv_scale_and_bias():
    # the quantization premise: IN of (s_c * z + b_c) == IN(z)
    key = jax.random.PRNGKey(4)
    z = jax.random.normal(key, (1, 8, 8, 4))
    s = jnp.array([0.5, 2.0, 3.0, 10.0])
    b = jnp.array([1.0, -2.0, 0.3, 5.0])
    g = jnp.ones((4,))
    z0 = jnp.zeros((4,))
    a = pnorms.instance_norm_act(z, g, z0, z0[:1], "none")
    bq = pnorms.instance_norm_act(z * s + b, g, z0, z0[:1], "none")
    np.testing.assert_allclose(np.asarray(a), np.asarray(bq), atol=1e-4)


@pytest.mark.parametrize("act", ["none", "prelu"])
@pytest.mark.parametrize("interpret", [False, True])
def test_instance_norm_act_quant_matches_float(act, interpret):
    pnorms.INTERPRET = interpret
    try:
        key = jax.random.PRNGKey(5)
        acc = jax.random.randint(key, (1, 8, 16, 8), -4000, 4000, jnp.int32)
        g = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (8,))) + 0.5
        b = jax.random.normal(jax.random.PRNGKey(7), (8,)) * 0.2
        alpha = jnp.full((8,), 0.25)
        q = instance_norm_act_quant(acc, g, b, alpha, act)
        assert q.dtype == jnp.int8
        # float reference
        y = pnorms.instance_norm_act(acc.astype(jnp.float32), g, b, alpha, act)
        ref = np.clip(np.round(np.asarray(y) * quant.QSCALE), -127, 127)
        np.testing.assert_allclose(np.asarray(q).astype(np.float32), ref, atol=1.0)
    finally:
        pnorms.INTERPRET = False


def test_quant_norm_residual_interpret_packed():
    # exercises the lane-packed pallas path incl. integer residual math
    pnorms.INTERPRET = True
    try:
        acc = jax.random.randint(jax.random.PRNGKey(8), (1, 8, 16, 8),
                                 -4000, 4000, jnp.int32)
        g = jnp.ones((8,))
        b = jnp.zeros((8,))
        res = jax.random.randint(jax.random.PRNGKey(9), (1, 8, 16, 8),
                                 -100, 100, jnp.int8)
        q = instance_norm_act_quant(acc, g, b, jnp.zeros((1,)), "none",
                                    residual=res, res_rescale=1.0)
        y = pnorms.instance_norm_act(acc.astype(jnp.float32), g, b,
                                     jnp.zeros((1,)), "none")
        ref = np.clip(np.round(np.asarray(y) * quant.QSCALE)
                      + np.asarray(res), -127, 127)
        np.testing.assert_allclose(np.asarray(q).astype(np.float32), ref, atol=1.0)
    finally:
        pnorms.INTERPRET = False


def test_quant_residual_add_exact():
    acc = jnp.zeros((1, 8, 16, 8), jnp.int32)
    g = jnp.zeros((8,))  # gamma=0 -> normalized term vanishes
    b = jnp.zeros((8,))
    res = jnp.full((1, 8, 16, 8), 17, jnp.int8)
    q = instance_norm_act_quant(acc, g, b, jnp.zeros((1,)), "none",
                                residual=res, res_rescale=2.0)
    np.testing.assert_array_equal(np.asarray(q), 34)


def test_quantized_orig_end_to_end_quality():
    model = UpscalerOrig(res_block_num=4, filters=8, kernel_size=3,
                         upscale_factor=2, phase_tail=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 16, 16, 3), minval=-1, maxval=1)
    variables = model.init(key, x)
    ref = model.apply(variables, x)
    qp = quantize_orig_params(variables["params"], res_block_num=4)
    out = quantized_orig_apply(qp, x, dtype=jnp.float32)
    assert out.shape == ref.shape
    db = float(psnr(ref, out))
    assert db > 30.0, f"int8 turbo path too lossy: {db:.1f} dB vs bf16"
