"""Does a device->host metric fetch overlap the NEXT step's device
execution over the axon tunnel? Measures the GAN train step (bench
config) three ways:

  sync      : fetch step b's metrics before dispatching b+1 (the
              round-3 loop + bench protocol)
  pipelined : dispatch b+1, then fetch b's metrics (1-step lag — what
              train/loop.py could do)
  batched   : dispatch K steps, fetch only the last metric (upper
              bound: pure device throughput + dispatch)
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

N = 12


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.losses import (
        pixel_mse, wasserstein_pair_losses)
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator, UpscalerOrig)
    from video_cycle_gan_upscaling_tpu.train import (
        create_gan_state, make_gan_step)

    log(f"devices: {jax.devices()}")
    gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                       res_block_num=16, dtype=jnp.bfloat16,
                       head_block=4, trunk_pack=True)
    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    state, m = step(state, lr, hr)  # compile
    float(m["loss_gan_total"])

    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    log(f"sync      : {(time.perf_counter() - t0) / N * 1e3:6.1f} ms/step")

    pend = None
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, lr, hr)
        if pend is not None:
            float(pend["loss_gan_total"])
        pend = m
    float(pend["loss_gan_total"])
    log(f"pipelined : {(time.perf_counter() - t0) / N * 1e3:6.1f} ms/step")

    t0 = time.perf_counter()
    for _ in range(N):
        state, m = step(state, lr, hr)
    float(m["loss_gan_total"])
    log(f"batched   : {(time.perf_counter() - t0) / N * 1e3:6.1f} ms/step")


if __name__ == "__main__":
    main()
