"""Round-3 scout F: train-step time decomposition (VERDICT r2 item 6).

The fused GAN step at the headline config (bs=8, 256^2 crops, x4) sits
at ~21% of bf16 peak (scripts/train_step_roofline.py). This scout times
the pieces to find the waste:

- G forward, pixel tail (the training default) vs phase tail
- G forward+backward, pixel vs phase tail
- the isolated 9x9 final conv at 256^2 (3/128 MXU output lanes in pixel
  space — the known inference bottleneck the phase tail fixed)
- PatchGAN D forward+backward

Hypotheses: (a) the pixel-space head conv wastes ~97% of its MXU lanes
in training just as it did in inference; (b) one of the two G forwards
per step (steps.py make_gan_step) is recoverable via jax.vjp reuse.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

RPC_MS = 29.0


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, rounds=10):
    out = fn(*args)
    s = float(jax.tree_util.tree_leaves(out)[0].sum()
              if hasattr(jax.tree_util.tree_leaves(out)[0], "sum")
              else out)
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / rounds * 1e3
    log(f"{name:38s}: {ms:7.1f} ms ({ms - RPC_MS:6.1f} on-device)")
    return ms


def main():
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator,
        UpscalerOrig,
    )

    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    lr = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 64, 64, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (8, 256, 256, 3)),
                     jnp.float32)

    for tag, pt in (("pixel", False), ("phase", True)):
        gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                           res_block_num=16, dtype=jnp.bfloat16,
                           phase_tail=pt)
        params = gen.init(rng, lr[:1])["params"]

        def fwd(p, x):
            return jnp.mean(jnp.square(
                gen.apply({"params": p}, x, train=True).astype(jnp.float32)
                - hr.astype(jnp.float32)))

        timeit(f"G fwd ({tag} tail)", jax.jit(fwd), params, lr)
        timeit(f"G fwd+bwd ({tag} tail)",
               jax.jit(jax.grad(fwd)), params, lr)

    # isolated 9x9 head at 256^2 in pixel space (3/128 output lanes)
    w9 = jnp.asarray(np.random.default_rng(2).normal(
        0, 0.01, (9, 9, 256, 3)), jnp.bfloat16)
    y256 = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, (8, 256, 256, 256)), jnp.bfloat16)

    def head(w, y):
        from jax import lax

        from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

        out = lax.conv_general_dilated(y, w, (1, 1), "SAME",
                                       dimension_numbers=sp.CONV_DIMS)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    timeit("head 9x9 256ch->3 @256^2 fwd", jax.jit(head), w9, y256)
    timeit("head 9x9 fwd+bwd", jax.jit(jax.grad(head, argnums=(0, 1))),
           w9, y256)

    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    dparams = disc.init(rng, hr[:1])["params"]

    def dfwd(p, x):
        return jnp.mean(jnp.square(
            disc.apply({"params": p}, x, train=True).astype(jnp.float32)))

    timeit("D fwd @256^2", jax.jit(dfwd), dparams, hr)
    timeit("D fwd+bwd @256^2", jax.jit(jax.grad(dfwd)), dparams, hr)


if __name__ == "__main__":
    main()
