"""Adversarial losses as pure functions of (real_logits, fake_logits).

The reference expresses these as Keras loss closures over symbolic
discriminator outputs (model.py:159-261). Here they are plain functions —
the fused jitted GAN step computes D(real), D(fake) and both losses in one
graph, replacing the reference's three device trips (SURVEY.md §3.2).

Sign conventions FOLLOW THE REFERENCE exactly (they are globally
consistent, just mirrored vs textbook WGAN):
- wasserstein: D minimizes mean(D(real)) - mean(D(fake)); G minimizes
  mean(D(fake)) (model.py:215-235 + the ±1-label trick train_gan.py:310-313)
- relativistic: D minimizes act(mean(real) - mean(fake)); G minimizes
  act(mean(fake) - mean(real)) (model.py:239-261)
LSGAN (the north-star CycleGAN loss) uses the standard real=1/fake=0 form.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


def loss_activation(x, kind: str):
    """The GanLosses activation registry (model.py:172-181)."""
    if kind in ("none", None, "identity", "linear"):
        return x
    if kind == "sigmoid":
        return jnp.reciprocal(1.0 + jnp.exp(-x))
    if kind in ("log-sigm", "log"):
        return -jnp.logaddexp(0.0, -x)
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "bi-log":
        ax = jnp.abs(x)
        return (x / (1.0 + ax)) * jnp.log(ax + 2.0)
    raise ValueError(f"unknown loss activation: {kind}")


def wasserstein_loss(y_true, y_pred):
    """mean(y_true * y_pred) — the ±1-label formulation (model.py:159-160)."""
    return jnp.mean(y_true.astype(jnp.float32) * y_pred.astype(jnp.float32))


class AdvLosses(NamedTuple):
    """d_loss(real, fake) and g_loss(real, fake) -> scalars."""

    d_loss: Callable
    g_loss: Callable


def wasserstein_pair_losses(activation: str = "none") -> AdvLosses:
    def d_loss(real, fake):
        return jnp.mean(real.astype(jnp.float32)) - jnp.mean(fake.astype(jnp.float32))

    def g_loss(real, fake):
        return jnp.mean(fake.astype(jnp.float32))

    return AdvLosses(d_loss, g_loss)


def relativistic_pair_losses(activation: str = "log-sigm") -> AdvLosses:
    def d_loss(real, fake):
        l = jnp.mean(real.astype(jnp.float32)) - jnp.mean(fake.astype(jnp.float32))
        return loss_activation(l, activation)

    def g_loss(real, fake):
        l = jnp.mean(fake.astype(jnp.float32)) - jnp.mean(real.astype(jnp.float32))
        return loss_activation(l, activation)

    return AdvLosses(d_loss, g_loss)


def lsgan_pair_losses(activation: str = "none") -> AdvLosses:
    """Least-squares GAN: D -> (real-1)^2 + fake^2, G -> (fake-1)^2."""

    def d_loss(real, fake):
        real = real.astype(jnp.float32)
        fake = fake.astype(jnp.float32)
        return 0.5 * (jnp.mean(jnp.square(real - 1.0)) + jnp.mean(jnp.square(fake)))

    def g_loss(real, fake):
        return jnp.mean(jnp.square(fake.astype(jnp.float32) - 1.0))

    return AdvLosses(d_loss, g_loss)


def make_adversarial_losses(kind: str, activation: str = "none") -> AdvLosses:
    """Factory keyed on LossConfig.adversarial_loss (train_gan3.py:274-278
    parity: 'wasserstein' | 'relativistic'; 'lsgan' is the CycleGAN
    addition)."""
    if kind == "wasserstein":
        return wasserstein_pair_losses(activation)
    if kind in ("relativistic", "rel"):
        return relativistic_pair_losses(activation)
    if kind == "lsgan":
        return lsgan_pair_losses(activation)
    raise ValueError(f"unknown adversarial loss: {kind}")
