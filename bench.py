"""Benchmark: 540p->1080p tiled video upscaling, frames/sec/chip.

Headline metric from BASELINE.md: >=60 frames/sec/chip for 540p->1080p
(x2) tiled inference with the flagship SRGAN-style generator (16 res
blocks, 64 filters, bf16 compute) on one TPU chip. vs_baseline is
value/60 (the reference publishes no numbers of its own — SURVEY.md §6 —
so the north-star target is the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Secondary numbers (train-step time at 256^2 crops, whole-frame fps) go to
stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: remote TPU compiles of big graphs take minutes;
# cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

FRAME_HW = (540, 960)
TILE_HW = (288, 512)
OVERLAP = 16
FACTOR = 2
N_FRAMES = 32
TARGET_FPS = 60.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tiled_inference():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16, phase_tail=True)
    rng = jax.random.PRNGKey(0)
    tile0 = jnp.zeros((1, *TILE_HW, 3), jnp.float32)
    variables = model.init(rng, tile0)
    params = variables["params"]

    upscale = make_tiled_upscaler(lambda p, x: model.apply({"params": p}, x),
                                  FRAME_HW, TILE_HW, OVERLAP, FACTOR)

    frames = [jnp.asarray(np.random.default_rng(i).uniform(-1, 1, (*FRAME_HW, 3)),
                          jnp.float32) for i in range(4)]
    frames = [jax.device_put(f) for f in frames]

    # compile + warmup
    upscale(params, frames[0]).block_until_ready()
    t0 = time.perf_counter()
    upscale(params, frames[1]).block_until_ready()
    log(f"single-frame latency: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    # steady-state: submit all, block at the end (device-side pipelining)
    t0 = time.perf_counter()
    out = None
    for i in range(N_FRAMES):
        out = upscale(params, frames[i % len(frames)])
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return N_FRAMES / dt


def bench_train_step():
    from video_cycle_gan_upscaling_tpu.losses import pixel_mse, wasserstein_pair_losses
    from video_cycle_gan_upscaling_tpu.models import PatchGanDiscriminator, UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train import create_gan_state, make_gan_step

    gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                       res_block_num=16, dtype=jnp.bfloat16)
    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    state, m = step(state, lr, hr)  # compile
    jax.block_until_ready(m)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / n


def main():
    log(f"devices: {jax.devices()}")
    fps = bench_tiled_inference()
    log(f"tiled 540p->1080p: {fps:.2f} frames/sec/chip")
    try:
        step_s = bench_train_step()
        log(f"GAN train step (bs=8, 256^2 crops): {step_s * 1e3:.1f} ms")
    except Exception as e:  # secondary metric must not kill the headline
        log(f"train-step bench failed: {e}")
    print(json.dumps({
        "metric": "tiled_upscale_540p_to_1080p",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
