"""A/B: the full-Pallas stage-1+head chain at x4 tail8.

pair_conv per-phase (int8 in/out) WINS isolated (5.35 vs 7.24 ms/f)
but LOSES in-graph feeding XLA's head conv (relayout at the custom-call
boundary); the Pallas head_s48 loses isolated vs XLA's formulation. The
untested combination: Pallas stage-1 -> Pallas head — if the two
kernels share the native int8 layout, the relayout disappears and both
isolated wins could land. VCGU_HEAD_ZP=0 throughout (the Pallas head
takes a [96] bias vector, not the zp bias map) — speed is
zp-independent.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

RPC_MS = 29.0
BATCH = 8
HW = (270, 480)


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, frames, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    log(f"{name:52s}: {ms:7.1f} ms = {(ms - RPC_MS) / frames:6.2f} ms/f "
        f"({frames / ms * 1e3:6.2f} fps raw)")
    return ms


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    log(f"devices: {jax.devices()}")
    os.environ["VCGU_HEAD_ZP"] = "0"
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert(
        "RGB").resize((HW[1], HW[0]), Image.BICUBIC)
    cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, *HW, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    ref = None
    for pair_ph, head_pl in ((0, 0), (1, 0), (0, 1), (1, 1)):
        os.environ["VCGU_PAIR_PHASE"] = str(pair_ph)
        os.environ["VCGU_HEAD_PALLAS"] = str(head_pl)
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                           tile_hw=HW, quant="tail8")
        qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
        out = np.asarray(jax.jit(r.apply_u8)(qp, x[:1]))
        if ref is None:
            ref = out.astype(np.int32)
        else:
            mad = float(np.mean(np.abs(out.astype(np.int32) - ref)))
            log(f"  u8 MAD vs XLA/XLA: {mad:.5f}")
        timeit(f"x4 tail8 pair_phase={pair_ph} head_pallas={head_pl} "
               f"apply_u8 b{BATCH}", r.apply_u8, qp, x, frames=BATCH)


if __name__ == "__main__":
    main()
