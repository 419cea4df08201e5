"""Discriminator zoo tests: shapes, activations registry, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.models import discriminators as D
from video_cycle_gan_upscaling_tpu.utils.config import ModelConfig


def _run(model, h=64, w=64, n=2):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, h, w, 3), minval=-1, maxval=1)
    variables = model.init(key, x)
    return model.apply(variables, x)


@pytest.mark.parametrize("cls", [D.DiscriminatorSimple512, D.DiscriminatorThin512])
def test_global_disc_scalar_output(cls):
    y = _run(cls(), h=64, w=64)
    assert y.shape == (2, 1)


def test_sparse_disc_scalar_output():
    # valid-padding 5x5 stride-3 pyramid needs a larger input
    y = _run(D.DiscriminatorSparse512(), h=512, w=512, n=1)
    assert y.shape == (1, 1)


def test_patchgan_outputs_logit_map():
    y = _run(D.PatchGanDiscriminator(), h=64, w=64)
    assert y.shape == (2, 8, 8, 1)  # 3 stride-2 layers: 64 / 8


@pytest.mark.parametrize("kind,check", [
    ("none", lambda x, y: np.allclose(y, x)),
    ("sigmoid", lambda x, y: np.allclose(y, 1 / (1 + np.exp(-x)), rtol=1e-4, atol=1e-6)),
    ("log-sigm", lambda x, y: np.allclose(y, np.log(1 / (1 + np.exp(-x))), rtol=1e-4, atol=1e-6)),
    ("tanh", lambda x, y: np.allclose(y, np.tanh(x), rtol=1e-4, atol=1e-6)),
    ("bi-log", lambda x, y: np.allclose(
        y, (x / (1 + np.abs(x))) * np.log(np.abs(x) + 2), rtol=1e-4, atol=1e-6)),
])
def test_output_activation_registry(kind, check):
    x = np.linspace(-3, 3, 13, dtype=np.float32)
    y = np.asarray(D.output_activation(jnp.asarray(x), kind))
    assert check(x, y)


def test_factory_aliases():
    for name in ("simple-512", "s512", "thin-512", "sparse-512", "patchgan"):
        cfg = ModelConfig(discriminator=name)
        assert D.make_discriminator(cfg) is not None


def test_disc_grad_flow():
    model = D.PatchGanDiscriminator(base_filters=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 32, 32, 3))
    variables = model.init(key, x)

    def loss_fn(params):
        return jnp.mean(model.apply({"params": params}, x))

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
