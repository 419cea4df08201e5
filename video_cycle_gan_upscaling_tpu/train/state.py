"""Train-state containers (pure pytrees) for the fused jitted updates.

The reference holds training state implicitly inside compiled Keras models
sharing weights via the discriminator.trainable toggle
(/root/reference/upscaling/upscaler/model.py:1017-1125). Here state is an
explicit pytree — {params, optimizer state, step, PRNG key, replay buffer}
— donated into a single jitted step per trainer, which is what makes
checkpoint/resume (SURVEY.md §5.4) and data-parallel sharding trivial.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState (params/tx/opt_state/step) — no extra fields; models
    are stateless (InstanceNorm) so no batch-stats collection is needed."""


@struct.dataclass
class ReplayBuffer:
    """HBM-resident fake-image ring buffer (the CycleGAN history pool).

    Device-side only: sample+swap happens inside the jitted step, no host
    round trips. Semantics match the classic pool: with p=0.5 return the
    incoming fake, else return a random stored one and store the incoming.
    """

    images: jax.Array  # [capacity, H, W, C]
    size: jax.Array    # scalar int32, grows to capacity
    ptr: jax.Array     # scalar int32 ring pointer

    @staticmethod
    def create(capacity: int, shape, dtype=jnp.float32) -> "ReplayBuffer":
        return ReplayBuffer(
            images=jnp.zeros((capacity, *shape), dtype),
            size=jnp.zeros((), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
        )

    def push_sample(self, rng: jax.Array, fakes: jax.Array):
        """Insert ``fakes`` [B,H,W,C]; return (new_buffer, batch) where each
        returned image is the incoming fake or a swapped-out stored one."""
        cap = self.images.shape[0]
        b = fakes.shape[0]
        idx = (self.ptr + jnp.arange(b, dtype=jnp.int32)) % cap
        new_images = self.images.at[idx].set(jax.lax.stop_gradient(fakes))
        new_size = jnp.minimum(self.size + b, cap)
        new_ptr = (self.ptr + b) % cap

        use_rng, pick_rng = jax.random.split(rng)
        # use stored image with p=0.5 once the buffer has content
        use_stored = jnp.logical_and(
            jax.random.bernoulli(use_rng, 0.5, (b,)), self.size > 0
        )
        stored_idx = jax.random.randint(pick_rng, (b,), 0, jnp.maximum(self.size, 1))
        stored = self.images[stored_idx]
        out = jnp.where(use_stored[:, None, None, None], stored, fakes)
        return ReplayBuffer(new_images, new_size, new_ptr), out


@struct.dataclass
class GanTrainState:
    """Paired-GAN trainer state: generator + discriminator + PRNG."""

    g: TrainState
    d: TrainState
    rng: jax.Array


@struct.dataclass
class CycleGanTrainState:
    """Full CycleGAN state: G_A (A->B), G_B (B->A), D_A, D_B, fake pools."""

    g_ab: TrainState
    g_ba: TrainState
    d_a: TrainState
    d_b: TrainState
    pool_a: ReplayBuffer  # stores fake-A images (outputs of G_B)
    pool_b: ReplayBuffer  # stores fake-B images (outputs of G_A)
    rng: jax.Array


def make_optimizer(learning_rate: float = 1e-3, b1: float = 0.9,
                   b2: float = 0.999) -> optax.GradientTransformation:
    """Adam with Keras defaults (model.py:1026 ``Adam()`` parity: lr=1e-3)."""
    return optax.adam(learning_rate, b1=b1, b2=b2)


def create_generator_state(model, rng, sample_input, tx=None,
                           train_kwargs: dict | None = None) -> TrainState:
    tx = tx if tx is not None else make_optimizer()
    variables = model.init({"params": rng, "dropout": rng}, sample_input,
                           **(train_kwargs or {}))
    return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)


def create_gan_state(generator, discriminator, rng, sample_lr, sample_hr,
                     g_tx=None, d_tx=None) -> GanTrainState:
    kg, kd, krest = jax.random.split(rng, 3)
    g = create_generator_state(generator, kg, sample_lr, g_tx)
    d = create_generator_state(discriminator, kd, sample_hr, d_tx)
    return GanTrainState(g=g, d=d, rng=krest)


def create_cyclegan_state(gen_ab, gen_ba, disc_a, disc_b, rng, sample_a,
                          sample_b, pool_size: int = 50, tx_factory:
                          Callable[[], Any] | None = None) -> CycleGanTrainState:
    tx_factory = tx_factory or (lambda: make_optimizer(2e-4, b1=0.5))
    k1, k2, k3, k4, krest = jax.random.split(rng, 5)
    g_ab = create_generator_state(gen_ab, k1, sample_a, tx_factory())
    g_ba = create_generator_state(gen_ba, k2, sample_b, tx_factory())
    d_a = create_generator_state(disc_a, k3, sample_a, tx_factory())
    d_b = create_generator_state(disc_b, k4, sample_b, tx_factory())
    shape_a = sample_a.shape[1:]
    shape_b = sample_b.shape[1:]
    return CycleGanTrainState(
        g_ab=g_ab, g_ba=g_ba, d_a=d_a, d_b=d_b,
        pool_a=ReplayBuffer.create(pool_size, shape_a),
        pool_b=ReplayBuffer.create(pool_size, shape_b),
        rng=krest,
    )
