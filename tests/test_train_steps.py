"""Fused train-step integration tests — the jitted analogs of the
reference's gan_test.ipynb smoke test (SURVEY.md §4): one real update,
finite losses, weights actually move."""

import jax
import jax.numpy as jnp
import numpy as np

from video_cycle_gan_upscaling_tpu.losses import (
    lsgan_pair_losses,
    make_content_loss_per_example,
    pixel_mse,
    relativistic_pair_losses,
    wasserstein_pair_losses,
)
from video_cycle_gan_upscaling_tpu.models import (
    PatchGanDiscriminator,
    UpscalerOrig,
    CycleGanResnetGenerator,
)
from video_cycle_gan_upscaling_tpu.train import (
    create_cyclegan_state,
    create_gan_state,
    create_generator_state,
    make_cyclegan_step,
    make_gan_step,
    make_supervised_step,
)

KEY = jax.random.PRNGKey(0)
LR = jax.random.uniform(KEY, (2, 8, 8, 3), minval=-1, maxval=1)
HR = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)


def _snap(tree):
    # donated-state-safe host snapshot
    return jax.tree_util.tree_map(np.asarray, tree)


def _tree_diff(a, b):
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _gen():
    return UpscalerOrig(res_block_num=1, filters=8, kernel_size=3)


def _disc():
    return PatchGanDiscriminator(base_filters=8, n_layers=2)


def test_supervised_step_updates_params():
    state = create_generator_state(_gen(), KEY, LR)
    step = make_supervised_step(make_content_loss_per_example("mse"))
    old_params = _snap(state.params)
    new_state, metrics = step(state, LR, HR)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    assert _tree_diff(new_state.params, old_params) > 0


def test_supervised_step_loss_decreases():
    state = create_generator_state(_gen(), KEY, LR)
    step = make_supervised_step(make_content_loss_per_example("mse"))
    losses = []
    for _ in range(20):
        state, metrics = step(state, LR, HR)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_supervised_step_multisource_metrics():
    # cgc-style fused batch: 3 sources x 1 example
    lr3 = jnp.concatenate([LR[:1]] * 3)
    hr3 = jnp.concatenate([HR[:1]] * 3)
    state = create_generator_state(_gen(), KEY, lr3)
    step = make_supervised_step(
        make_content_loss_per_example("mse"), n_sources=3,
        source_names=("1gen", "2gen", "scal"))
    _, metrics = step(state, lr3, hr3)
    for k in ("loss", "loss_1gen", "loss_2gen", "loss_scal"):
        assert np.isfinite(float(metrics[k]))
    # identical sources -> identical per-source losses
    assert float(metrics["loss_1gen"]) == float(metrics["loss_2gen"])


def test_gan_step_wasserstein():
    state = create_gan_state(_gen(), _disc(), KEY, LR, HR)
    step = make_gan_step(wasserstein_pair_losses(),
                         lambda t, p: pixel_mse(t, p),
                         adversarial_loss_weight=1e-3)
    old_g, old_d = _snap(state.g.params), _snap(state.d.params)
    old_rng = np.asarray(state.rng)
    new_state, m = step(state, LR, HR)
    for k in ("loss_disc", "loss_gan_gen", "loss_gan_disc"):
        assert np.isfinite(float(m[k])), k
    assert _tree_diff(new_state.g.params, old_g) > 0
    assert _tree_diff(new_state.d.params, old_d) > 0
    # rng advanced
    assert not np.array_equal(np.asarray(new_state.rng), old_rng)


def test_gan_step_relativistic():
    state = create_gan_state(_gen(), _disc(), KEY, LR, HR)
    step = make_gan_step(relativistic_pair_losses("log-sigm"),
                         lambda t, p: pixel_mse(t, p),
                         adversarial_loss_weight=1e-3)
    _, m = step(state, LR, HR)
    assert np.isfinite(float(m["loss_disc"]))
    assert np.isfinite(float(m["loss_gan_disc"]))


def test_gan_step_vjp_matches_two_forward_form():
    """The single-G-forward vjp formulation in make_gan_step produces the
    same updates as naively re-running G inside the G loss (chain rule) —
    the equivalence claimed in its docstring, checked end-to-end."""
    adv = wasserstein_pair_losses()
    content = lambda t, p: pixel_mse(t, p)
    clw, dlw = 1.0, 1e-3

    def two_forward_step(state, lr, hr):
        fake = jax.lax.stop_gradient(
            state.g.apply_fn({"params": state.g.params}, lr, train=True))

        def d_loss_fn(d_params):
            r = state.d.apply_fn({"params": d_params}, hr, train=True)
            f = state.d.apply_fn({"params": d_params}, fake, train=True)
            return adv.d_loss(r, f)

        new_d = state.d.apply_gradients(grads=jax.grad(d_loss_fn)(state.d.params))

        def g_loss_fn(g_params):
            fake2 = state.g.apply_fn({"params": g_params}, lr, train=True)
            f2 = new_d.apply_fn({"params": new_d.params}, fake2, train=True)
            r2 = new_d.apply_fn({"params": new_d.params}, hr, train=True)
            return clw * content(hr, fake2) + dlw * adv.g_loss(r2, f2)

        new_g = state.g.apply_gradients(grads=jax.grad(g_loss_fn)(state.g.params))
        return new_g.params, new_d.params

    ref_g, ref_d = jax.jit(two_forward_step)(
        create_gan_state(_gen(), _disc(), KEY, LR, HR), LR, HR)
    step = make_gan_step(adv, content, content_loss_weight=clw,
                         adversarial_loss_weight=dlw)
    new_state, _ = step(create_gan_state(_gen(), _disc(), KEY, LR, HR), LR, HR)
    assert _tree_diff(new_state.g.params, ref_g) < 1e-5
    assert _tree_diff(new_state.d.params, ref_d) < 1e-5


def test_gan_step_multiple_iterations_stable():
    state = create_gan_state(_gen(), _disc(), KEY, LR, HR)
    step = make_gan_step(wasserstein_pair_losses(),
                         lambda t, p: pixel_mse(t, p),
                         adversarial_loss_weight=1e-6)
    for _ in range(5):
        state, m = step(state, LR, HR)
    assert np.isfinite(float(m["loss_gan_total"]))


def test_cyclegan_step():
    a = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1, maxval=1)
    gen = lambda: CycleGanResnetGenerator(filters=8, res_block_num=1)
    state = create_cyclegan_state(gen(), gen(), _disc(), _disc(), KEY, a, b,
                                  pool_size=4)
    step = make_cyclegan_step(lsgan_pair_losses())
    old = _snap(state.g_ab.params)
    for i in range(3):
        state, m = step(state, a, b)
    for k in ("loss_g_total", "loss_g_adv", "loss_cycle", "loss_identity",
              "loss_d_a", "loss_d_b"):
        assert np.isfinite(float(m[k])), k
    assert _tree_diff(state.g_ab.params, old) > 0
    # pool filled: 3 steps x 2 images, capacity 4
    assert int(state.pool_a.size) == 4
    assert int(state.pool_a.ptr) == 2


def test_replay_buffer_semantics():
    from video_cycle_gan_upscaling_tpu.train.state import ReplayBuffer

    buf = ReplayBuffer.create(4, (2, 2, 1))
    fakes = jnp.ones((2, 2, 2, 1))
    # first push: buffer was empty -> returned batch must be the fakes
    buf, out = jax.jit(lambda b, r, f: b.push_sample(r, f))(buf, KEY, fakes)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
    assert int(buf.size) == 2
    buf, out2 = jax.jit(lambda b, r, f: b.push_sample(r, f))(
        buf, jax.random.PRNGKey(9), fakes * 2)
    # each returned image is either the new fake (2.0) or a stored one (1.0)
    vals = set(np.unique(np.asarray(out2)))
    assert vals.issubset({1.0, 2.0})
    assert int(buf.size) == 4
