"""A/B: one-pass Pallas exact-phase up conv (VCGU_PHASE_UP=1) vs the
four-XLA-conv exact form, in-graph at the x4 tail8 operating point
(full apply_u8 + held-out quality, bench protocol)."""

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


def timeit(name, fn, *args, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / BATCH
    log(f"{name:52s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f")
    return per_f


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops.pallas import phase_up

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]

    def frame(name, interp):
        img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
        img = img.resize((HW[1], HW[0]), interp)
        return jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]

    cal = frame("input_480x270.png", Image.BICUBIC)
    ev = frame("eval_ukiyo_1080p.jpg", Image.LANCZOS)

    r_bf = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                          tile_hw=HW, quant=False)
    out_bf = jax.jit(r_bf.apply)(jax.device_put(r_bf.qp), ev)

    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, *HW, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    for pallas in ("0", "1"):
        os.environ["VCGU_PHASE_UP"] = pallas
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                           tile_hw=HW, quant="tail8")
        if pallas == "1":
            th = phase_up._pick_th(2 * HW[0], 2 * HW[1], 256, 256, True)
            log(f"phase_up block rows th = {th}")
        qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
        out_q = jax.jit(r.apply)(qp, ev)
        mse = float(np.mean((np.asarray(out_q, np.float32)
                             - np.asarray(out_bf, np.float32)) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        tag = "pallas-1pass" if pallas == "1" else "xla-4conv  "
        timeit(f"x4 tail8 {tag} apply_u8 [{psnr:.2f} dB]",
               r.apply_u8, qp, x)


if __name__ == "__main__":
    main()
