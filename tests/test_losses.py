"""Loss library tests (reference semantics: model.py:101-261)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.losses import adversarial as A
from video_cycle_gan_upscaling_tpu.losses import content as C
from video_cycle_gan_upscaling_tpu.models import vgg


def test_pixel_losses():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.full((2, 4, 4, 3), 0.5)
    assert float(C.pixel_mse(a, b)) == pytest.approx(0.25)
    assert float(C.pixel_mae(a, b)) == pytest.approx(0.5)


def test_per_example_matches_mean():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4, 8, 8, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    per = C.pixel_mse_per_example(a, b)
    assert per.shape == (4,)
    np.testing.assert_allclose(float(jnp.mean(per)), float(C.pixel_mse(a, b)), rtol=1e-6)


def test_wasserstein_label_formulation():
    # mean(y_true * y_pred) with ±1 labels (model.py:159, train_gan.py:310-313)
    y_pred = jnp.array([2.0, -3.0])
    assert float(A.wasserstein_loss(jnp.array([1.0, 1.0]), y_pred)) == pytest.approx(-0.5)
    assert float(A.wasserstein_loss(jnp.array([-1.0, -1.0]), y_pred)) == pytest.approx(0.5)


def test_wasserstein_pair_losses_reference_signs():
    adv = A.wasserstein_pair_losses()
    real = jnp.array([[1.0], [3.0]])
    fake = jnp.array([[2.0], [2.0]])
    # D: mean(real) - mean(fake) (model.py:220-223)
    assert float(adv.d_loss(real, fake)) == pytest.approx(0.0)
    # G: mean(fake) (model.py:230-233)
    assert float(adv.g_loss(real, fake)) == pytest.approx(2.0)


def test_relativistic_pair_losses():
    adv = A.relativistic_pair_losses("tanh")
    real = jnp.array([[2.0]])
    fake = jnp.array([[1.0]])
    assert float(adv.d_loss(real, fake)) == pytest.approx(np.tanh(1.0), rel=1e-5)
    assert float(adv.g_loss(real, fake)) == pytest.approx(np.tanh(-1.0), rel=1e-5)


def test_lsgan_pair_losses():
    adv = A.lsgan_pair_losses()
    real = jnp.array([[1.0]])
    fake = jnp.array([[0.0]])
    assert float(adv.d_loss(real, fake)) == pytest.approx(0.0)
    assert float(adv.g_loss(real, fake)) == pytest.approx(1.0)


def test_vgg_extractor_deterministic_and_shaped():
    ex = vgg.get_extractor(seed=3)
    assert ex.source == "random"
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    f = ex(x)
    # 32 / 2^4 pools = 2 spatial, 512 channels at block5_conv4
    assert f.shape == (1, 2, 2, 512)
    f2 = vgg.get_extractor(seed=3)(x)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f2))


def test_vgg_content_loss_zero_for_identical():
    ex = vgg.get_extractor(seed=0)
    loss = C.make_content_loss("vgg-only", vgg=ex)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3), minval=-1, maxval=1)
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-8)
    y = jnp.clip(x + 0.3, -1, 1)
    assert float(loss(x, y)) > 0


def test_vgg_mse_adds_pixel_term():
    ex = vgg.get_extractor(seed=0)
    l_only = C.make_content_loss("vgg-only", vgg=ex)
    l_mse = C.make_content_loss("vgg-mse", rate=0.1, vgg=ex)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3), minval=-1, maxval=1)
    y = jnp.clip(x + 0.1, -1, 1)
    diff = float(l_mse(x, y)) - float(l_only(x, y))
    assert diff == pytest.approx(0.1 * float(C.pixel_mse(x, y)), rel=1e-4)


def test_vgg_npz_roundtrip(tmp_path):
    params = vgg.init_random_params(seed=1)
    flat = {}
    for name, p in params.items():
        flat[f"{name}/kernel"] = np.asarray(p["kernel"])
        flat[f"{name}/bias"] = np.asarray(p["bias"])
    path = tmp_path / "vgg.npz"
    np.savez(path, **flat)
    ex = vgg.get_extractor(weights_path=str(path))
    assert ex.source == "imagenet"
    x = jnp.ones((1, 32, 32, 3)) * 0.2
    np.testing.assert_allclose(
        np.asarray(ex(x)), np.asarray(vgg.VGGExtractor(params)(x)), rtol=1e-5)
