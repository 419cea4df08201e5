"""Generator zoo: shape, range, jit-ability, and grad-flow tests.

The reference had no tests; these are the jitted analogs of its informal
notebook checks (cnn_test.ipynb shape arithmetic — SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.models import generators as G
from video_cycle_gan_upscaling_tpu.utils.config import ModelConfig

SMALL = dict(h=16, w=16)


def _run(model, h=16, w=16, train=False, rngs=None):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, h, w, 3), minval=-1, maxval=1)
    variables = model.init({"params": key, "dropout": key}, x)
    kwargs = {"rngs": rngs} if rngs else {}
    y = model.apply(variables, x, train=train, **kwargs)
    return variables, x, y


@pytest.mark.parametrize("name,cls_kwargs", [
    ("orig", dict(res_block_num=2)),
    ("skip-con", dict(res_block_num=2)),
    ("resnet-att", dict(res_block_num=2)),
])
def test_srgan_family_shapes(name, cls_kwargs):
    cfg = ModelConfig(generator=name, res_block_num=2)
    model = G.make_generator(cfg, upscale_factor=4)
    _, x, y = _run(model)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_incep_resnet_shape():
    model = G.UpscalerIncepResnet(filters=32, a_block_num=1, b_block_num=1, c_block_num=1)
    _, x, y = _run(model)
    assert y.shape == (1, 64, 64, 3)


@pytest.mark.parametrize("cls", [G.UpscalerUnetish, G.UpscalerUnetishAdd])
def test_unetish_shapes(cls):
    model = cls(step_size=1, downscale_times=2, initial_filters=8, upscale_factor=4)
    _, x, y = _run(model, h=16, w=16)
    assert y.shape == (1, 64, 64, 3)


def test_unetish_complex_shape():
    model = G.UpscalerUnetishComplex(step_size=1, downscale_times=2,
                                     initial_filters=8, upscale_factor=4)
    _, x, y = _run(model, h=16, w=16)
    assert y.shape == (1, 64, 64, 3)


def test_unetish_nondivisible_input_cropped_exactly():
    # 18 not divisible by 2^2: crop-merge machinery must still produce
    # exactly input*factor (model.py:619-632 behavior).
    model = G.UpscalerUnetish(step_size=1, downscale_times=2, initial_filters=8,
                              upscale_factor=2)
    _, x, y = _run(model, h=18, w=10)
    assert y.shape == (1, 36, 20, 3)


def test_cyclegan_resnet_same_resolution():
    model = G.CycleGanResnetGenerator(filters=16, res_block_num=2)
    _, x, y = _run(model, h=32, w=32)
    assert y.shape == (1, 32, 32, 3)


def test_generator_is_jittable_and_resolution_agnostic():
    model = G.UpscalerOrig(res_block_num=1, filters=8)
    key = jax.random.PRNGKey(0)
    x16 = jnp.zeros((1, 16, 16, 3))
    x24 = jnp.zeros((2, 24, 20, 3))
    variables = model.init(key, x16)
    apply = jax.jit(lambda v, x: model.apply(v, x))
    assert apply(variables, x16).shape == (1, 64, 64, 3)
    # same params, new spatial shape (replaces the reference's
    # layers.pop(0) re-instantiation trick, upscaler_mini_testing.ipynb)
    assert apply(variables, x24).shape == (2, 96, 80, 3)


def test_gradients_flow():
    model = G.UpscalerOrig(res_block_num=1, filters=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 8, 8, 3), minval=-1, maxval=1)
    variables = model.init(key, x)

    def loss_fn(params):
        y = model.apply({"params": params}, x)
        return jnp.mean(jnp.square(y))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_bfloat16_compute_path():
    model = G.UpscalerOrig(res_block_num=1, filters=8, dtype=jnp.bfloat16)
    _, x, y = _run(model, h=8, w=8)
    # outputs are cast back to f32 after tanh
    assert y.dtype == jnp.float32
    assert y.shape == (1, 32, 32, 3)


def test_dropout_only_active_in_train_mode():
    model = G.UpscalerUnetish(step_size=1, downscale_times=1, initial_filters=4,
                              upscale_factor=2, dropout_rate=0.5)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 8, 8, 3), minval=-1, maxval=1)
    variables = model.init({"params": key}, x)
    y1 = model.apply(variables, x, train=False)
    y2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    t1 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


@pytest.mark.parametrize("family", ["orig", "attention", "cyclegan"])
def test_head_block_equivalent_values_and_grads(family):
    """head_block=4 (the S-blocked training head: 48 MXU output lanes
    instead of 3) must match the plain pixel head in values AND
    parameter gradients — same params, same linear map, different
    blocking only (round-3 train-step trace: the 3-lane head region was
    22 of 52 ms device time). One ResNet-tail family, one
    attention-tail family, and the k=7 CycleGAN head cover the three
    head variants."""
    import numpy as np
    from video_cycle_gan_upscaling_tpu.models import generators as G

    mk = {
        "orig": lambda hb: G.UpscalerOrig(
            kernel_size=3, filters=8, upscale_factor=4, res_block_num=2,
            dtype=jnp.float32, head_block=hb),
        "attention": lambda hb: G.UpscalerAttention(
            kernel_size=3, filters=8, upscale_factor=2, res_block_num=2,
            dtype=jnp.float32, head_block=hb),
        "cyclegan": lambda hb: G.CycleGanResnetGenerator(
            filters=8, res_block_num=2, dtype=jnp.float32, head_block=hb),
    }[family]
    x = jnp.asarray(np.random.default_rng(5).uniform(
        -1, 1, (2, 16, 16, 3)), jnp.float32)
    m1, m4 = mk(1), mk(4)
    variables = m1.init(jax.random.PRNGKey(3), x)
    y1 = m1.apply(variables, x)
    y4 = m4.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)

    tgt = jnp.ones_like(y1) * 0.1

    def loss(m):
        return lambda p: jnp.mean(
            (m.apply({"params": p}, x) - tgt) ** 2)

    g1 = jax.grad(loss(m1))(variables["params"])
    g4 = jax.grad(loss(m4))(variables["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat4 = dict(jax.tree_util.tree_leaves_with_path(g4))
    for path, l1 in flat1:
        l4 = flat4[path]
        np.testing.assert_allclose(
            np.asarray(l4), np.asarray(l1), rtol=5e-4, atol=5e-5,
            err_msg=str(path))


def test_orig_trunk_pack_equivalent_values_and_grads():
    """trunk_pack=True (W-pair-packed trunk: full 128 MXU lanes on the
    64-channel trunk convs) must match the canonical trunk in values
    AND parameter gradients — the packing is a spatial reshape, the
    pair kernels are einsum rearrangements of the same params, and the
    packed instance-norm stats fold the two W-slots exactly."""
    import numpy as np
    from video_cycle_gan_upscaling_tpu.models.generators import UpscalerOrig

    x = jnp.asarray(np.random.default_rng(6).uniform(
        -1, 1, (2, 12, 16, 3)), jnp.float32)
    m0 = UpscalerOrig(kernel_size=3, filters=8, upscale_factor=2,
                      res_block_num=2, dtype=jnp.float32, trunk_pack=False)
    mp = UpscalerOrig(kernel_size=3, filters=8, upscale_factor=2,
                      res_block_num=2, dtype=jnp.float32, trunk_pack=True)
    variables = m0.init(jax.random.PRNGKey(4), x)
    y0 = m0.apply(variables, x)
    yp = mp.apply(variables, x)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)

    tgt = jnp.full_like(y0, -0.2)

    def loss(m):
        return lambda p: jnp.mean((m.apply({"params": p}, x) - tgt) ** 2)

    g0 = jax.grad(loss(m0))(variables["params"])
    gp = jax.grad(loss(mp))(variables["params"])
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flatp = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, l0 in flat0:
        lp = flatp[path]
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(l0), rtol=1e-3, atol=1e-5,
            err_msg=str(path))
