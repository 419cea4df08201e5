"""Device-level decomposition of the cgc supervised step (3x2 sources,
512² output, mse) — the weakest-MFU trainer at 27.5% after the round-3
head/trunk work. Uses utils.profiling.device_op_table."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_cgc"


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train import (
        create_generator_state, make_supervised_step)
    from video_cycle_gan_upscaling_tpu.utils.profiling import (
        device_op_table)

    log(f"devices: {jax.devices()}")
    gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                       res_block_num=16, dtype=jnp.bfloat16,
                       head_block=4, trunk_pack=True)
    lr6 = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (6, 128, 128, 3)), jnp.float32)
    hr6 = jnp.asarray(np.random.default_rng(3).uniform(
        -1, 1, (6, 512, 512, 3)), jnp.float32)
    state = create_generator_state(gen, jax.random.PRNGKey(0), lr6[:1])
    step = make_supervised_step(
        lambda t, p: jnp.mean(jnp.square(t.astype(jnp.float32)
                                         - p.astype(jnp.float32)),
                              axis=(1, 2, 3)),
        n_sources=3, source_names=("gen1", "gen2", "scaled"))
    state, m = step(state, lr6, hr6)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(6):
        state, m = step(state, lr6, hr6)
        float(m["loss"])
    log(f"step: {(time.perf_counter() - t0) / 6 * 1e3:.1f} ms "
        f"(incl ~29 RPC)")

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, m = step(state, lr6, hr6)
            float(m["loss"])
    rows = device_op_table(TRACE_DIR, iters=3)
    tot = sum(r["ms"] for r in rows)
    log(f"\ntotal device time {tot:.1f} ms/step; top 25 ops:")
    for r in rows[:25]:
        mfu = (r["model_flops"] / 3 / (r["ms"] / 1e3) / 197e12 * 100
               if r["ms"] else 0.0)
        log(f"{r['ms']:8.2f} ms  mfu~{mfu:5.1f}%  "
            f"{r['hlo_category'][:22]:22s} {r['name'][:34]:34s} "
            f"{r['source'].split('/')[-1][:40]}")


if __name__ == "__main__":
    main()
