"""Fused jitted train steps — one device trip per update.

The reference's GAN step is three separate host->GPU trips per batch
(G.predict, D.train_on_batch, GAN.train_on_batch —
/root/reference/upscaling/train_gan.py:305-317, SURVEY.md §3.2). Each
factory below returns ONE jitted function taking (state, batch) ->
(new_state, metrics): generator forward, discriminator real/fake, both
losses, and both Adam updates compile into a single XLA program with the
state donated, so parameters and optimizer state never leave HBM.

The reference's ``discriminator.trainable`` toggle (model.py:1034-1043)
becomes structural here: each loss differentiates only its own net's
params; the other net's params enter as non-differentiated inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from video_cycle_gan_upscaling_tpu.losses.adversarial import AdvLosses
from video_cycle_gan_upscaling_tpu.train.state import (
    CycleGanTrainState,
    GanTrainState,
    TrainState,
)


def _apply(net: TrainState, params, x, train: bool = False, rng=None):
    kwargs = {"train": train}
    if rng is not None:
        return net.apply_fn({"params": params}, x, rngs={"dropout": rng}, **kwargs)
    return net.apply_fn({"params": params}, x, **kwargs)


def make_supervised_step(content_loss_per_example: Callable,
                         n_sources: int = 1,
                         source_names: Optional[tuple] = None,
                         seed: int = 0) -> Callable:
    """Supervised SR update (train.py/train_mini.py/train_cgc*.py analog).

    ``n_sources > 1`` fuses the cgc trainers' per-source passes: the batch
    is ordered [src0 | src1 | ...] with equal segments toward the same HR
    targets, and metrics include per-source losses — replacing
    train_cgc.py:275-278's three sequential train_on_batch calls with one
    fused update (mathematically the cgc_mini formulation,
    train_cgc_mini.py:269-275).
    """
    names = source_names or tuple(f"src{i}" for i in range(n_sources))
    base_key = jax.random.PRNGKey(seed)

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, lr: jax.Array, hr: jax.Array):
        rng = jax.random.fold_in(base_key, state.step)

        def loss_fn(params):
            pred = _apply(state, params, lr, train=True, rng=rng)
            per = content_loss_per_example(hr, pred)
            return jnp.mean(per), per

        (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss}
        if n_sources > 1:
            seg = per.reshape(n_sources, -1)
            for i, name in enumerate(names):
                metrics[f"loss_{name}"] = jnp.mean(seg[i])
        return new_state, metrics

    return step


def make_gan_step(adv: AdvLosses, content_loss: Callable,
                  content_loss_weight: float = 1.0,
                  adversarial_loss_weight: float = 1e-10) -> Callable:
    """Paired-GAN update: covers train_gan.py (wasserstein), train_gan2.py
    and train_gan3.py (relativistic / wasserstein via ``adv``).

    Order parity with the reference loop (train_gan.py:305-317):
    1. fakes from the CURRENT generator,
    2. discriminator update on (real, fake),
    3. generator update against the UPDATED discriminator
       (content * clw + adversarial * dlw, train_gan.py:240-244).

    The generator runs forward ONCE per step: ``jax.vjp`` saves the
    pullback, the D update consumes ``stop_gradient(fake)``, and the G
    update differentiates the loss w.r.t. the fake IMAGE and pulls the
    cotangent back through the saved vjp — identical gradients to
    re-running G inside the G loss (chain rule), minus a full G forward
    (~15% of the step, docs/PERF.md round-3 decomposition). The one
    semantic change vs the two-forward form: dropout generators (the
    unetish family) sample a single mask per step shared by both
    consumers, instead of one mask per consumer — still an unbiased
    dropout-SGD estimator.
    """

    @partial(jax.jit, donate_argnums=0)
    def step(state: GanTrainState, lr: jax.Array, hr: jax.Array):
        rng, g_rng = jax.random.split(state.rng)

        # ---- one generator forward (pullback kept for the G update) -----
        fake, g_vjp = jax.vjp(
            lambda p: _apply(state.g, p, lr, train=True, rng=g_rng),
            state.g.params)

        # ---- discriminator update --------------------------------------
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            real_out = _apply(state.d, d_params, hr, train=True)
            fake_out = _apply(state.d, d_params, fake_sg, train=True)
            return adv.d_loss(real_out, fake_out), (real_out, fake_out)

        (loss_d, (real_out, fake_out)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d.params)
        new_d = state.d.apply_gradients(grads=grads_d)

        # ---- generator update (vs updated D; D params not differentiated)
        def g_loss_from_fake(fake2):
            fake_out2 = _apply(new_d, new_d.params, fake2, train=True)
            real_out2 = _apply(new_d, new_d.params, hr, train=True)
            c = content_loss(hr, fake2)
            a = adv.g_loss(real_out2, fake_out2)
            total = content_loss_weight * c + adversarial_loss_weight * a
            return total, (c, a)

        (loss_g, (loss_content, loss_adv)), fake_cot = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)(fake)
        (grads_g,) = g_vjp(fake_cot)
        new_g = state.g.apply_gradients(grads=grads_g)

        metrics = {
            "loss_disc": loss_d,
            "loss_gan_gen": loss_content,   # reference TSV column names
            "loss_gan_disc": loss_adv,      # (train_gan.py:277)
            "loss_gan_total": loss_g,
            "d_real_mean": jnp.mean(real_out),
            "d_fake_mean": jnp.mean(fake_out),
        }
        return GanTrainState(g=new_g, d=new_d, rng=rng), metrics

    return step


def make_cyclegan_step(adv: AdvLosses,
                       cycle_loss_weight: float = 10.0,
                       identity_loss_weight: float = 5.0) -> Callable:
    """Full CycleGAN update (BASELINE config 3): G_A/G_B joint update with
    LSGAN + cycle + identity losses, then D_A/D_B updates against
    pool-sampled fakes. The replay pools live in HBM inside the state and
    are updated device-side (train/state.py ReplayBuffer)."""

    @partial(jax.jit, donate_argnums=0)
    def step(state: CycleGanTrainState, real_a: jax.Array, real_b: jax.Array):
        rng, pool_a_rng, pool_b_rng = jax.random.split(state.rng, 3)

        # ---- joint generator update ------------------------------------
        def g_loss_fn(params):
            p_ab, p_ba = params
            fake_b = _apply(state.g_ab, p_ab, real_a, train=True)
            fake_a = _apply(state.g_ba, p_ba, real_b, train=True)
            rec_a = _apply(state.g_ba, p_ba, fake_b, train=True)
            rec_b = _apply(state.g_ab, p_ab, fake_a, train=True)
            idt_b = _apply(state.g_ab, p_ab, real_b, train=True)
            idt_a = _apply(state.g_ba, p_ba, real_a, train=True)

            d_b_fake = _apply(state.d_b, state.d_b.params, fake_b, train=True)
            d_a_fake = _apply(state.d_a, state.d_a.params, fake_a, train=True)
            adv_ab = adv.g_loss(None, d_b_fake)
            adv_ba = adv.g_loss(None, d_a_fake)

            l1 = lambda x, y: jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
            cyc = l1(rec_a, real_a) + l1(rec_b, real_b)
            idt = l1(idt_b, real_b) + l1(idt_a, real_a)
            total = (adv_ab + adv_ba
                     + cycle_loss_weight * cyc
                     + identity_loss_weight * idt)
            return total, (adv_ab + adv_ba, cyc, idt, fake_a, fake_b)

        (loss_g, (loss_adv, loss_cyc, loss_idt, fake_a, fake_b)), grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                (state.g_ab.params, state.g_ba.params)))
        new_g_ab = state.g_ab.apply_gradients(grads=grads[0])
        new_g_ba = state.g_ba.apply_gradients(grads=grads[1])

        # ---- replay pools ----------------------------------------------
        pool_a, pooled_fake_a = state.pool_a.push_sample(
            pool_a_rng, jax.lax.stop_gradient(fake_a))
        pool_b, pooled_fake_b = state.pool_b.push_sample(
            pool_b_rng, jax.lax.stop_gradient(fake_b))

        # ---- discriminator updates -------------------------------------
        def d_loss_fn(d_params, d_state, real, fake):
            real_out = _apply(d_state, d_params, real, train=True)
            fake_out = _apply(d_state, d_params, fake, train=True)
            return adv.d_loss(real_out, fake_out)

        loss_d_a, grads_d_a = jax.value_and_grad(d_loss_fn)(
            state.d_a.params, state.d_a, real_a, pooled_fake_a)
        new_d_a = state.d_a.apply_gradients(grads=grads_d_a)
        loss_d_b, grads_d_b = jax.value_and_grad(d_loss_fn)(
            state.d_b.params, state.d_b, real_b, pooled_fake_b)
        new_d_b = state.d_b.apply_gradients(grads=grads_d_b)

        metrics = {
            "loss_g_total": loss_g,
            "loss_g_adv": loss_adv,
            "loss_cycle": loss_cyc,
            "loss_identity": loss_idt,
            "loss_d_a": loss_d_a,
            "loss_d_b": loss_d_b,
        }
        new_state = CycleGanTrainState(
            g_ab=new_g_ab, g_ba=new_g_ba, d_a=new_d_a, d_b=new_d_b,
            pool_a=pool_a, pool_b=pool_b, rng=rng)
        return new_state, metrics

    return step
