"""Benchmark: 540p->1080p tiled video upscaling, frames/sec/chip.

Headline metric from BASELINE.md: >=60 frames/sec/chip for 540p->1080p
(x2) tiled inference with the flagship SRGAN-style generator (16 res
blocks, 64 filters, bf16 compute, phase-space tail) on one TPU chip.
vs_baseline is value/60 (the reference publishes no numbers of its own —
SURVEY.md §6 — so the north-star target is the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Secondary numbers (single-frame latency, GAN train-step time at 256^2
crops) go to stderr.
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
# single whole-frame tile: no halo waste, and InstanceNorm statistics match
# whole-frame inference exactly
TILE_HW = (540, 960)
OVERLAP = 16
FACTOR = 2
FRAME_BATCH = 4
N_ROUNDS = 8
TARGET_FPS = 60.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _flagship():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig

    return UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                        res_block_num=16, dtype=jnp.bfloat16, phase_tail=True)


def bench_tiled_inference():
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    model = _flagship()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, *TILE_HW, 3), jnp.float32))
    # pre-cast params to bf16: inference-only, saves the per-call casts
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables["params"])

    upscale = make_tiled_upscaler(lambda p, x: model.apply({"params": p}, x),
                                  FRAME_HW, TILE_HW, OVERLAP, FACTOR)

    batches = [jnp.asarray(
        np.random.default_rng(i).uniform(-1, 1, (FRAME_BATCH, *FRAME_HW, 3)),
        jnp.float32) for i in range(4)]
    batches = [jax.device_put(b) for b in batches]

    # fetch a scalar each call: block_until_ready is unreliable on the
    # tunneled platform, so force execution via a tiny device->host pull
    probe = jax.jit(lambda p, x: jnp.sum(upscale.batch(p, x)))
    one = jax.jit(lambda p, x: jnp.sum(upscale(p, x)))
    float(probe(params, batches[0]))  # compile + warmup
    float(one(params, batches[0][0]))
    t0 = time.perf_counter()
    float(one(params, batches[1][0]))
    log(f"single-frame latency: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    t0 = time.perf_counter()
    for i in range(N_ROUNDS):
        float(probe(params, batches[i % len(batches)]))
    dt = time.perf_counter() - t0
    return N_ROUNDS * FRAME_BATCH / dt


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
    float(m["loss_gan_total"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    return (time.perf_counter() - t0) / n


def main():
    log(f"devices: {jax.devices()}")
    fps = bench_tiled_inference()
    log(f"tiled 540p->1080p (batch {FRAME_BATCH}): {fps:.2f} frames/sec/chip")
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
