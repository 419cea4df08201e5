"""Round-3 scout H: the GAN step with pixel vs phase training tails.

scripts/microbench_r3f.py (decomposition) showed the phase tail's
FORWARD is ~2.4x faster than the pixel tail at the training geometry
(49.7 vs 120.6 ms on-device for G fwd at bs=8, 64^2 -> 256^2) but its
fwd+bwd is slower (192 vs 113) — the in-jit kernel-rearrangement
gathers (ops/subpixel.py) autodiff to scatter-adds, and the head's
S=16 blocked kernel is a ~50M-element gather. This scout times the
REAL fused GAN step (the metric that matters) under:

  - pixel tail (the shipping default)
  - phase tail as-is
  - phase tail with the head's extra-blocking clamped (smaller gather)

at the bench config (bs=8, 256^2 crops, x4, wasserstein + mse).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(*a):
    print(*a, flush=True)


def bench_step(tag, gen):
    from video_cycle_gan_upscaling_tpu.losses import (
        pixel_mse,
        wasserstein_pair_losses,
    )
    from video_cycle_gan_upscaling_tpu.models import PatchGanDiscriminator
    from video_cycle_gan_upscaling_tpu.train import create_gan_state, make_gan_step

    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    state, m = step(state, lr, hr)
    float(m["loss_gan_total"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    ms = (time.perf_counter() - t0) / n * 1e3
    log(f"GAN step ({tag:22s}): {ms:7.1f} ms")
    return ms


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    log(f"devices: {jax.devices()}")
    for tag, kwargs in (
        ("pixel tail", dict(phase_tail=False)),
        ("phase tail", dict(phase_tail=True)),
        ("phase tail, extra<=1", dict(phase_tail=True, phase_head_extra=1)),
    ):
        gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                           res_block_num=16, dtype=jnp.bfloat16, **kwargs)
        bench_step(tag, gen)


if __name__ == "__main__":
    main()
