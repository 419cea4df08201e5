"""Device-level decomposition of the fused GAN train step (bs=8, 256²,
bench config) via jax.profiler — the tunnel DOES deliver device-side
XLA op events (round-3 discovery; see scripts/profile_decomp.py for
the aggregation helper). Prints the top ops by time with source lines
so the ~63% non-MXU share of the 85 ms step can be attributed."""

import collections
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_train"


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
                       head_block=4, trunk_pack=True)  # trainers' config
    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    state, m = step(state, lr, hr)
    float(m["loss_gan_total"])
    t0 = time.perf_counter()
    for _ in range(6):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    log(f"step: {(time.perf_counter() - t0) / 6 * 1e3:.1f} ms "
        f"(incl ~29 ms RPC)")

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, m = step(state, lr, hr)
            float(m["loss_gan_total"])

    path = sorted(glob.glob(
        f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = [e for e in d.get("traceEvents", [])
          if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3]
    agg = collections.Counter()
    cat = collections.Counter()
    src = {}
    args_of = {}
    for e in ev:
        agg[e["name"]] += e.get("dur", 0)
        a = e.get("args", {})
        cat[a.get("hlo_category", "?")] += e.get("dur", 0)
        src.setdefault(e["name"], a.get("source", "?"))
        args_of.setdefault(e["name"], a)
    tot = sum(agg.values())
    log(f"\ntotal device time {tot / 3e3:.2f} ms/step")
    log("\n-- by hlo category --")
    for c, us in cat.most_common():
        log(f"{us / 3e3:8.2f} ms  {c}")
    log("\n-- top 40 ops --")
    for name, us in agg.most_common(40):
        a = args_of[name]
        fl = int(a.get("model_flops", 0) or 0)
        mfu = (fl / 3 / (us / 3e6) / 197e12 * 100) if us else 0.0
        log(f"{us / 3e3:8.2f} ms  mfu~{mfu:5.1f}%  {name[:40]:40s} "
            f"{src[name].split('/')[-1][:50]}")


if __name__ == "__main__":
    main()
