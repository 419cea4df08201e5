"""Train-step roofline (VERDICT r2 item 6): time the fused GAN, cgc
(supervised multi-source) and CycleGAN steps on the real chip, pull FLOP
counts from XLA's cost analysis, and report MFU against v5e peak.

BASELINE.md names "train-step time at 256^2 crops" a primary metric; this
records where each step sits against the hardware, not just the wall
time. Timing forces execution with a scalar fetch (~29 ms RPC floor on
the tunneled platform, reported alongside).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

V5E_BF16_PEAK = 197e12  # FLOP/s
RPC_MS = 29.0


def log(*a):
    print(*a, flush=True)


def bench_step(name, step, state, *batch, rounds=10):
    lowered = jax.jit(lambda s, *b: step(s, *b)).lower(state, *batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan"))) if cost else float("nan")
    state, m = step(state, *batch)
    key = sorted(m.keys())[0]
    float(m[key])  # forced fetch
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, m = step(state, *batch)
        float(m[key])
    ms = (time.perf_counter() - t0) / rounds * 1e3
    mfu = flops / ((ms - RPC_MS) * 1e-3) / V5E_BF16_PEAK * 100
    log(f"{name}: {ms:7.1f} ms/step ({ms - RPC_MS:.1f} on-device), "
        f"XLA-counted {flops / 1e12:.2f} TFLOP -> {mfu:.1f}% of bf16 peak")
    return state


def main():
    from video_cycle_gan_upscaling_tpu.losses import (
        lsgan_pair_losses,
        pixel_mse,
        wasserstein_pair_losses,
    )
    from video_cycle_gan_upscaling_tpu.models import (
        CycleGanResnetGenerator,
        PatchGanDiscriminator,
        UpscalerOrig,
    )
    from video_cycle_gan_upscaling_tpu.train import (
        create_cyclegan_state,
        create_gan_state,
        create_generator_state,
        make_cyclegan_step,
        make_gan_step,
        make_supervised_step,
    )

    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)

    # --- paired GAN at the headline config (bs=8, 256^2 crops, x4) ------
    gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                       res_block_num=16, dtype=jnp.bfloat16,
                       head_block=4, trunk_pack=True)  # trainers' config
    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 64, 64, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (8, 256, 256, 3)),
                     jnp.float32)
    state = create_gan_state(gen, disc, rng, lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    bench_step("gan bs=8 256^2 (wasserstein+mse)", step, state, lr, hr)

    # --- cgc supervised step (3 sources, bs=2 each -> 6 imgs/step) -------
    gen2 = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                        res_block_num=16, dtype=jnp.bfloat16,
                        head_block=4, trunk_pack=True)
    lr6 = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (6, 128, 128, 3)),
                      jnp.float32)
    hr6 = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (6, 512, 512, 3)),
                      jnp.float32)
    sstate = create_generator_state(gen2, rng, lr6[:1])
    sstep = make_supervised_step(
        lambda t, p: jnp.mean(jnp.square(t.astype(jnp.float32)
                                         - p.astype(jnp.float32)),
                              axis=(1, 2, 3)),
        n_sources=3, source_names=("gen1", "gen2", "scaled"))
    bench_step("cgc supervised 3x2 512^2 (mse)", sstep, sstate, lr6, hr6)

    # --- CycleGAN step (config 3/5 workload) at 256^2 --------------------
    cg = lambda: CycleGanResnetGenerator(dtype=jnp.bfloat16,
                                         head_block=4)
    cd = lambda: PatchGanDiscriminator(dtype=jnp.bfloat16)
    a = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (2, 256, 256, 3)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, 256, 256, 3)),
                    jnp.float32)
    cstate = create_cyclegan_state(cg(), cg(), cd(), cd(), rng, a[:1], b[:1],
                                   pool_size=16)
    cstep = make_cyclegan_step(lsgan_pair_losses())
    bench_step("cyclegan bs=2 256^2 (lsgan)", cstep, cstate, a, b)


if __name__ == "__main__":
    main()
