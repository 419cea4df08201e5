"""Device-level op decomposition of the fused inference graph via
jax.profiler (the tunnel delivers device-side XLA op events — round-3
discovery, same aggregation recipe as scripts/profile_train_step.py).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_infer.py \
    [factor] [mode]      # defaults: 2 tail8

Profiles apply_u8 at frame batch 8 on the bench geometry for the given
upscale factor (2 -> 540p, 4 -> 270p) and quant mode (bf16 / tail /
tail8 / int8 / mix:<spec>), prints per-category and top-op tables with
MFU (int8 ops against the 394 TOPS peak would need flop doubling —
model_flops from XLA is dtype-blind, so the MFU column is vs 197e12).
"""

import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TRACE_DIR = "/tmp/vcgu_trace_infer"
BATCH = 8


def log(*a):
    print(*a, flush=True)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mode = sys.argv[2] if len(sys.argv) > 2 else "tail8"
    quant = (True if mode == "int8" else False if mode == "bf16" else mode)
    hw = (540, 960) if factor == 2 else (270, 480)

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    log(f"devices: {jax.devices()}  factor {factor} mode {mode} hw {hw}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=factor,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *hw, 3), jnp.float32))["params"]
    r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                       tile_hw=hw, quant=quant)
    qp = jax.device_put(r.qp)
    if r.tail_quant_ready or r.quant:
        import os

        from PIL import Image

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "demo", "input_480x270.png")
        img = Image.open(path).convert("RGB").resize((hw[1], hw[0]),
                                                     Image.BICUBIC)
        cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)
        qp = r.calibrate(qp, cal[None])

    x = jax.jit(lambda key: jax.random.uniform(
        key, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(3))

    def probe(p, xx):
        out = jax.lax.optimization_barrier(r.apply_u8(p, xx))
        sl = out[tuple(slice(None, None, max(1, d // 4))
                       for d in out.shape)]
        return jnp.sum(sl.astype(jnp.float32))

    fn = jax.jit(probe)
    float(fn(qp, x))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(6):
        float(fn(qp, x))
    dt = (time.perf_counter() - t0) / 6
    log(f"apply_u8 b{BATCH}: {dt * 1e3:.1f} ms/iter = "
        f"{(dt * 1e3 - 29) / BATCH:.2f} ms/f (minus RPC floor)")

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            float(fn(qp, x))

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
    log(f"\ntotal device time {tot / 3e3:.2f} ms/iter = "
        f"{tot / 3e3 / BATCH:.2f} ms/f")
    log("\n-- by hlo category --")
    for c, us in cat.most_common():
        log(f"{us / 3e3:8.2f} ms  {c}")
    log("\n-- top 40 ops (ms per iter; mfu vs 197T) --")
    for name, us in agg.most_common(40):
        a = args_of[name]
        fl = int(a.get("model_flops", 0) or 0)
        mfu = (fl / 3 / (us / 3e6) / 197e12 * 100) if us else 0.0
        log(f"{us / 3e3:8.2f} ms  mfu~{mfu:5.1f}%  {name[:44]:44s} "
            f"{src[name].split('/')[-1][:46]}")


if __name__ == "__main__":
    main()
