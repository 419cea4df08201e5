"""Attribute the GAN step's up-conv fusions (subpixel.py conv_transpose_d2s,
~9.6 ms at ~32% MFU — docs/PERF.md round-4 candidate 4) between MXU time
and HBM traffic, from the device trace's per-op bytes/flops counters.

Pair-packing them is analysis-negative (the 3-wide LR kernel packs at 2.0x
structural taps, cancelling dgrad's <=2x lane win), so the question this
probe answers for round 4 is whether the 3x gap to roofline is bandwidth
(the stage-2 cotangents are [8,128,128,1024] bf16 = 268 MB per direction)
or scheduling. Trace parsing goes through the shared, tested
utils/profiling.device_op_table (pid/tid discovered from trace metadata;
raises instead of printing an empty table — ADVICE r3 items 2-3).
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_upconv"
PEAK_FLOPS = 197e12   # v5e bf16
PEAK_BW = 819e9       # v5e HBM bytes/s


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.losses import (
        pixel_mse, wasserstein_pair_losses)
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator, UpscalerOrig)
    from video_cycle_gan_upscaling_tpu.train import (
        create_gan_state, make_gan_step)
    from video_cycle_gan_upscaling_tpu.utils.profiling import device_op_table

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

    iters = 3
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(iters):
            state, m = step(state, lr, hr)
            float(m["loss_gan_total"])

    rows = device_op_table(TRACE_DIR, iters=iters)

    log("\n-- subpixel/up-conv ops: time vs flop vs byte rooflines --")
    tot_ms = tot_flop_ms = tot_byte_ms = 0.0
    matched = 0
    for r in rows:
        if "subpixel" not in str(r["source"]):
            continue
        matched += 1
        ms = r["ms"]
        t_fl = r["model_flops"] / PEAK_FLOPS * 1e3
        t_by = r["bytes_accessed"] / PEAK_BW * 1e3
        tot_ms += ms
        tot_flop_ms += t_fl
        tot_byte_ms += t_by
        bound = ("FLOP" if t_fl >= t_by else "BYTE") if (t_fl or t_by) else "?"
        log(f"{ms:8.2f} ms  flop-ideal {t_fl:6.2f}  byte-ideal {t_by:6.2f} "
            f" [{bound}]  {r['name'][:48]}")
    if not matched:
        raise RuntimeError(
            "no subpixel-sourced device ops in the trace — source "
            "attribution changed? Inspect device_op_table(TRACE_DIR) rows.")
    log(f"\nsubpixel total: {tot_ms:.2f} ms measured vs "
        f"{tot_flop_ms:.2f} flop-ideal / {tot_byte_ms:.2f} byte-ideal "
        f"(max = the roofline)")


if __name__ == "__main__":
    main()
