"""Attribute the GAN step's up-conv fusions (subpixel.py conv_transpose_d2s,
~9.6 ms at ~32% MFU — docs/PERF.md round-4 candidate 4) between MXU time
and HBM traffic, from the device trace's per-op bytes/flops counters.

Pair-packing them is analysis-negative (the 3-wide LR kernel packs at 2.0x
structural taps, cancelling dgrad's <=2x lane win), so the question this
probe answers for round 4 is whether the 3x gap to roofline is bandwidth
(the stage-2 cotangents are [8,128,128,1024] per direction) or scheduling.
"""

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
    args_of = {}
    for e in ev:
        agg[e["name"]] += e.get("dur", 0)
        args_of.setdefault(e["name"], e.get("args", {}))

    # one full arg dump so future probes know what counters exist
    sample = next((a for n, a in args_of.items()
                   if "subpixel" in str(a.get("source", ""))), None)
    if sample is not None:
        log("\n-- sample args of a subpixel-sourced op --")
        for k, v in sorted(sample.items()):
            log(f"  {k}: {str(v)[:120]}")

    log("\n-- subpixel/up-conv ops: time vs flop vs byte rooflines --")
    tot_ms = tot_flop_ms = tot_byte_ms = 0.0
    for name, us in agg.most_common():
        a = args_of[name]
        if "subpixel" not in str(a.get("source", "")):
            continue
        ms = us / 3e3
        fl = float(a.get("model_flops", 0) or 0)
        by = float(a.get("bytes_accessed", 0) or
                   a.get("bytes accessed", 0) or 0)
        t_fl = fl / PEAK_FLOPS * 1e3
        t_by = by / PEAK_BW * 1e3
        tot_ms += ms
        tot_flop_ms += t_fl
        tot_byte_ms += t_by
        bound = ("FLOP" if t_fl >= t_by else "BYTE") if (t_fl or t_by) else "?"
        log(f"{ms:8.2f} ms  flop-ideal {t_fl:6.2f}  byte-ideal {t_by:6.2f} "
            f" [{bound}]  {name[:48]}")
    log(f"\nsubpixel total: {tot_ms:.2f} ms measured vs "
        f"{tot_flop_ms:.2f} flop-ideal / {tot_byte_ms:.2f} byte-ideal "
        f"(max = the roofline)")


if __name__ == "__main__":
    main()
