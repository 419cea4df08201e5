"""Fused instance-norm kernel: correctness of forward (pallas interpret
mode on CPU + MXU fallback) and custom backward vs autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.ops.pallas import norms
from video_cycle_gan_upscaling_tpu.ops.nn import instance_norm, prelu, leaky_relu

KEY = jax.random.PRNGKey(0)
X = jax.random.normal(KEY, (2, 8, 16, 8), jnp.float32) * 2 + 0.5
G = jax.random.normal(jax.random.PRNGKey(1), (8,)) * 0.5 + 1.0
B = jax.random.normal(jax.random.PRNGKey(2), (8,)) * 0.3
A = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (8,))) * 0.2


def _ref(x, g, b, a, act):
    y = instance_norm(x, g, b)
    if act == "relu":
        return jnp.maximum(y, 0)
    if act == "leaky":
        return leaky_relu(y, 0.1)
    if act == "prelu":
        return prelu(y, a)
    return y


@pytest.mark.parametrize("act", ["none", "relu", "leaky", "prelu"])
@pytest.mark.parametrize("interpret", [False, True])
def test_forward_matches_reference(act, interpret):
    norms.INTERPRET = interpret
    try:
        alpha = jnp.array([0.1]) if act == "leaky" else A
        y = norms.instance_norm_act(X, G, B, alpha, act)
        ref = _ref(X, G, B, A, act)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
    finally:
        norms.INTERPRET = False


@pytest.mark.parametrize("act", ["none", "relu", "prelu"])
def test_backward_matches_autodiff(act):
    alpha = A

    def f_custom(x, g, b, a):
        return jnp.sum(jnp.sin(norms.instance_norm_act(x, g, b, a, act)))

    def f_ref(x, g, b, a):
        return jnp.sum(jnp.sin(_ref(x, g, b, a, act)))

    grads_c = jax.grad(f_custom, argnums=(0, 1, 2, 3))(X, G, B, alpha)
    grads_r = jax.grad(f_ref, argnums=(0, 1, 2, 3))(X, G, B, alpha)
    names = ["dx", "dgamma", "dbeta", "dalpha"]
    for n_, c, r in zip(names, grads_c, grads_r):
        if n_ == "dalpha" and act != "prelu":
            continue  # reference has no alpha dependence
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=5e-3, atol=5e-3, err_msg=n_)


def test_bf16_path():
    xb = X.astype(jnp.bfloat16)
    y = norms.instance_norm_act(xb, G, B, jnp.zeros((8,)), "none")
    assert y.dtype == jnp.bfloat16
    ref = instance_norm(xb, G, B)
    np.testing.assert_allclose(np.asarray(y.astype(jnp.float32)),
                               np.asarray(ref.astype(jnp.float32)),
                               rtol=3e-2, atol=3e-2)


def test_prelu_alpha_grad_nonzero_at_zero_init():
    # the reference PReLU init is alpha=0 (model.py:21); the fused kernel
    # must still produce a nonzero alpha gradient there
    a0 = jnp.zeros((8,))

    def f(a):
        return jnp.sum(norms.instance_norm_act(X, G, B - 1.0, a, "prelu"))

    da = jax.grad(f)(a0)
    assert float(jnp.max(jnp.abs(da))) > 0


def test_batch_norm_act_stateless():
    # stats over (N,H,W); at N=1 it equals instance norm
    y1 = norms.batch_norm_act(X[:1], G, B, A, "none")
    ref1 = norms.instance_norm_act(X[:1], G, B, A, "none")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref1),
                               rtol=1e-3, atol=1e-3)
    # N>1: per-channel batch statistics are normalized out
    y = norms.batch_norm_act(X, G, B - B, jnp.zeros((8,)), "none")
    yn = (np.asarray(y) / np.asarray(G))
    assert abs(yn.mean()) < 1e-3
    assert abs(yn.std() - 1.0) < 1e-2


def test_batch_norm_differentiable():
    def f(x, g, b):
        return jnp.sum(jnp.sin(norms.batch_norm_act(x, g, b, A, "prelu")))

    grads = jax.grad(f, argnums=(0, 1, 2))(X, G, B)
    for g_ in grads:
        assert np.all(np.isfinite(np.asarray(g_)))


def test_models_accept_batch_norm():
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator,
        UpscalerOrig,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 8, 8, 3), minval=-1, maxval=1)
    m = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3, norm="batch")
    v = m.init(key, x)
    y = m.apply(v, x)
    assert y.shape == (2, 32, 32, 3)
    # param tree identical to the instance-norm model (checkpoint compat)
    v_in = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3,
                        norm="instance").init(key, x)
    a = [p for p, _ in jax.tree_util.tree_leaves_with_path(v)]
    b = [p for p, _ in jax.tree_util.tree_leaves_with_path(v_in)]
    assert a == b
    d = PatchGanDiscriminator(base_filters=8, n_layers=2, norm="batch")
    vd = d.init(key, m.apply(v, x))
    assert d.apply(vd, m.apply(v, x)).shape == (2, 8, 8, 1)


def test_batch_norm_trains():
    from video_cycle_gan_upscaling_tpu.losses import make_content_loss_per_example
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train import (
        create_generator_state,
        make_supervised_step,
    )

    key = jax.random.PRNGKey(0)
    lr = jax.random.uniform(key, (2, 8, 8, 3), minval=-1, maxval=1)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3),
                            minval=-1, maxval=1)
    m = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3, norm="batch")
    state = create_generator_state(m, key, lr)
    step = make_supervised_step(make_content_loss_per_example("mse"))
    losses = []
    for _ in range(10):
        state, metrics = step(state, lr, hr)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
