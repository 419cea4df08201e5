"""Round-2 TPU microbench: fused-kernel runner vs the round-1 path.

Validates the fused conv+IN kernel numerics on the real chip, then times
the flagship 540p->1080p geometry (whole-frame tile, batch 4):
  1. round-1 path  (model.apply, phase tail, per-call kernel gathers)
  2. fast bf16     (FastOrigRunner: fused trunk + prepacked tail)
  3. fast int8     (same with W8A8 trunk)
plus PSNR of each fast path vs the round-1 output (quality gate).

Timing forces execution with a scalar fetch (block_until_ready is
unreliable over the axon tunnel; ~29 ms RPC floor per fetch, reported
raw like bench.py so numbers are comparable).
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

FRAME_HW = (540, 960)
BATCH = 4
ROUNDS = 8
FACTOR = 2


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, rounds=ROUNDS):
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(fn(*args))
    return (time.perf_counter() - t0) / rounds


def validate_small():
    from video_cycle_gan_upscaling_tpu.ops.pallas import fused_conv as fc

    N, H, W, C, PACK = 2, 24, 32, 8, 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, H, W, C), jnp.float32) * 0.7
    wk = jax.random.normal(jax.random.PRNGKey(1), (5, 5, C, C)) * 0.2
    res = jax.random.normal(jax.random.PRNGKey(2), (N, H, W, C)) * 0.5
    sc = jax.random.normal(jax.random.PRNGKey(3), (N, C)) * 0.3 + 1.0
    sh = jax.random.normal(jax.random.PRNGKey(4), (N, C)) * 0.2
    al = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (C,))) * 0.2
    xp = x.reshape(N, H, W // PACK, C * PACK)
    rp = res.reshape(N, H, W // PACK, C * PACK)
    t2 = lambda v: jnp.tile(v, (1, PACK))

    for quant in (False, True):
        w5, pads = fc.pack_conv_kernel(wk, PACK, quant=quant)
        got = fc.fused_conv_stats(
            xp, w5, pads=pads, pre="affine_res", scale=t2(sc), shift=t2(sh),
            res=rp, quant=quant)
        ref = fc._reference(xp, w5, pads=pads, pre="affine_res", act="none",
                            scale=t2(sc), shift=t2(sh), alpha=None, res=rp,
                            quant=quant)
        for name, g, r in zip(("y", "h", "stats"), got, ref):
            g = np.asarray(g, np.float32)
            r = np.asarray(r, np.float32)
            err = np.max(np.abs(g - r)) / max(1e-6, np.max(np.abs(r)))
            log(f"  validate quant={quant} {name}: rel err {err:.2e}")
            assert err < (1e-5 if quant else 2e-2), (name, err)
    # prelu variant
    w5, pads = fc.pack_conv_kernel(wk, PACK)
    got = fc.fused_conv_stats(xp, w5, pads=pads, pre="affine_act",
                              act="prelu", scale=t2(sc), shift=t2(sh),
                              alpha=jnp.tile(al, PACK))
    ref = fc._reference(xp, w5, pads=pads, pre="affine_act", act="prelu",
                        scale=t2(sc), shift=t2(sh), alpha=jnp.tile(al, PACK),
                        res=None, quant=False)
    err = np.max(np.abs(np.asarray(got[0], np.float32)
                        - np.asarray(ref[0], np.float32)))
    log(f"  validate prelu y: abs err {err:.2e}")
    assert err < 0.05
    log("validate_small OK")


def flagship():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    x0 = jnp.zeros((1, *FRAME_HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    params32 = variables["params"]
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params32)

    batch = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BATCH, *FRAME_HW, 3)), jnp.float32)
    batch = jax.device_put(batch)

    results = {}
    outs = {}

    def run(tag, fn, prm):
        probe = jax.jit(lambda p, v: jnp.sum(fn(p, v).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(probe(prm, batch))
        log(f"  {tag}: compile+warm {time.perf_counter() - t0:.1f}s")
        dt = timeit(probe, prm, batch)
        fps = BATCH / dt
        results[tag] = fps
        log(f"  {tag}: {dt * 1e3:.1f} ms/batch{BATCH} = {fps:.2f} fps")
        outs[tag] = np.asarray(jax.jit(fn)(prm, batch[:1]), np.float32)

    try:
        run("round1", lambda p, v: model.apply({"params": p}, v), params)
    except Exception:
        traceback.print_exc()
    try:
        r_bf = FastOrigRunner(params32, res_block_num=16,
                              upscale_factor=FACTOR, tile_hw=FRAME_HW)
        run("fast_bf16", r_bf.apply, jax.device_put(r_bf.qp))
    except Exception:
        traceback.print_exc()
    try:
        r_q = FastOrigRunner(params32, res_block_num=16,
                             upscale_factor=FACTOR, tile_hw=FRAME_HW,
                             quant=True)
        run("fast_int8", r_q.apply, jax.device_put(r_q.qp))
    except Exception:
        traceback.print_exc()

    if "round1" in outs:
        for tag in ("fast_bf16", "fast_int8"):
            if tag in outs:
                mse = float(np.mean((outs[tag] - outs["round1"]) ** 2))
                psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
                log(f"  PSNR {tag} vs round1: {psnr:.2f} dB")
    log("RESULTS " + " ".join(f"{k}={v:.2f}fps" for k, v in results.items()))


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    try:
        validate_small()
    except Exception:
        traceback.print_exc()
    flagship()
