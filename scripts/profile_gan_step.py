"""Profile the fused GAN train step on the TPU and print the top device
ops (VERDICT r2 item 6: where does the 21%-MFU step spend its time?).

Captures a jax.profiler trace around a few steps and aggregates the
perfetto trace.json.gz device events by op name. If the tunneled axon
platform can't produce device events, says so and exits 2 (fall back to
ablation timing).
"""

import glob
import gzip
import json
import os
import shutil
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_gan"


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.losses import pixel_mse, wasserstein_pair_losses
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator,
        UpscalerOrig,
    )
    from video_cycle_gan_upscaling_tpu.train import create_gan_state, make_gan_step

    log(f"devices: {jax.devices()}")
    gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                       res_block_num=16, dtype=jnp.bfloat16)
    disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
    lr = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 64, 64, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (8, 256, 256, 3)),
                     jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                         adversarial_loss_weight=1e-6)
    state, m = step(state, lr, hr)  # compile + warmup
    float(m["loss_gan_total"])

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        log("no trace.json.gz produced; profiler unsupported here")
        sys.exit(2)
    with gzip.open(max(files, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)

    # device events live on TPU track pids; aggregate complete events by name
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # find pids whose process name mentions TPU (device lanes)
    names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "tpu" in n or "/device" in n}
    log(f"process tracks: {sorted(set(names.values()))[:12]}")
    agg = {}
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"].split(".")[0]
        agg[name] = agg.get(name, 0.0) + e["dur"]
        total += e["dur"]
    if not agg:
        log("no device events in trace")
        sys.exit(2)
    log(f"\ntotal device event time: {total / 1e3 / 3:.1f} ms/step "
        f"(3 steps traced)")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        log(f"{dur / 1e3 / 3:9.2f} ms  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
