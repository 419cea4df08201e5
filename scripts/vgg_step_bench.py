"""VGG-loss train-step time at the reference config (VERDICT r1 item 4,
r3 item 4).

Reference geometry: train_gan.py defaults — bs=2 (x3 cgc sources = 6 LR
crops/step in the reference; here one fused step at bs=2), 512^2 crops,
resnet-att generator, simple-512 discriminator, vgg-only content loss
(frozen VGG19 block5_conv4 MSE). The extractor uses the documented
seeded-random weights (zero-egress env) — identical FLOPs/step time to
ImageNet weights, so this number stands for the real-weights config.

Round-4 additions: A/B over the VGG stem_block option (block1_conv1 at
512^2 runs 3 of 128 MXU input lanes; S-blocking folds s^2 pixels into
lanes — models/vgg.py), pipelined-fetch timing (the production loop
protocol, train/loop.py), and --trace for a device-op decomposition by
source (utils/profiling.device_op_table).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_vgg"


def log(*a):
    print(*a, flush=True)


def build_step(stem_block: int):
    from video_cycle_gan_upscaling_tpu.losses import (
        make_content_loss,
        wasserstein_pair_losses,
    )
    from video_cycle_gan_upscaling_tpu.models import UpscalerAttention
    from video_cycle_gan_upscaling_tpu.models.discriminators import (
        DiscriminatorSimple512,
    )
    from video_cycle_gan_upscaling_tpu.models.vgg import get_extractor
    from video_cycle_gan_upscaling_tpu.train import (
        create_gan_state,
        make_gan_step,
    )

    vgg = get_extractor(dtype=jnp.bfloat16, stem_block=stem_block)
    content = make_content_loss("vgg-only", vgg=vgg)
    gen = UpscalerAttention(kernel_size=5, filters=64, upscale_factor=4,
                            res_block_num=16, dtype=jnp.bfloat16,
                            head_block=4)  # trainers' S-blocked head
    disc = DiscriminatorSimple512(activation="log", dtype=jnp.bfloat16)
    bs = 2
    lr = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (bs, 128, 128, 3)), jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (bs, 512, 512, 3)), jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), content,
                         adversarial_loss_weight=1e-10)
    return step, state, lr, hr, vgg.source


def time_step(step, state, lr, hr, n=10):
    t0 = time.perf_counter()
    state, m = step(state, lr, hr)
    float(m["loss_gan_total"])
    log(f"  compile+first step: {time.perf_counter() - t0:.1f}s")
    # sync fetch
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    sync_ms = (time.perf_counter() - t0) / n * 1e3
    # pipelined fetch (production loop protocol)
    pend = None
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
        if pend is not None:
            float(pend["loss_gan_total"])
        pend = m
    float(pend["loss_gan_total"])
    pipe_ms = (time.perf_counter() - t0) / n * 1e3
    return state, sync_ms, pipe_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--stem-blocks", nargs="*", type=int, default=[1, 2, 4])
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")

    results = {}
    keep = None
    for sb in args.stem_blocks:
        step, state, lr, hr, source = build_step(sb)
        log(f"-- vgg stem_block={sb} (weights: {source}) --")
        state, sync_ms, pipe_ms = time_step(step, state, lr, hr)
        log(f"RESULT vgg-only GAN step (resnet-att + simple-512, bs=2, "
            f"512^2, stem_block={sb}): sync {sync_ms:.1f} ms / pipelined "
            f"{pipe_ms:.1f} ms")
        results[sb] = (sync_ms, pipe_ms)
        if keep is None:
            keep = (step, state, lr, hr)

    if args.trace:
        from video_cycle_gan_upscaling_tpu.utils.profiling import (
            device_op_table,
        )

        step, state, lr, hr = keep
        iters = 3
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(iters):
                state, m = step(state, lr, hr)
                float(m["loss_gan_total"])
        rows = device_op_table(TRACE_DIR, iters=iters)
        by_src = {}
        for r in rows:
            src = str(r["source"]).split("/")[-1]
            by_src[src] = by_src.get(src, 0.0) + r["ms"]
        log("\n-- device time by source file --")
        for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1]):
            log(f"  {ms:8.2f} ms  {src}")
        log("\n-- top 25 device ops --")
        for r in rows[:25]:
            log(f"  {r['ms']:7.2f} ms  {r['hlo_category'][:18]:18s} "
                f"{str(r['source']).split('/')[-1][:40]:40s} "
                f"{r['name'][:40]}")


if __name__ == "__main__":
    main()
