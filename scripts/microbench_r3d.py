"""Round-3 scout D: post-revert verification at 540p x2.

1. i8tail / int8 quality vs bf16 on the CALIBRATION frame and on a
   HELD-OUT reference frame (bias-corrected per-channel calibration,
   XLA pair up conv — the fused Pallas up conv measured slower and is
   now env-gated off).
2. clip_u8 fps for all three modes at 16x8.
"""

import gc
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

HW = (540, 960)


def log(*a):
    print(*a, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def frame(name, resample):
    img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
    arr = np.asarray(img.resize((HW[1], HW[0]), resample),
                     np.float32) / 127.5 - 1.0
    return jnp.asarray(arr, jnp.float32)


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=2,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    cal = frame("input_480x270.png", Image.BICUBIC)
    held = frame("eval_ukiyo_1080p.jpg", Image.LANCZOS)

    runners = {}
    for tag, q in (("bf16", False), ("i8tail", "tail"), ("int8", True)):
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=2,
                           tile_hw=HW, quant=q)
        qp = jax.device_put(r.qp)
        if r.tail_quant_ready:
            qp = r.calibrate(qp, cal[None])
        runners[tag] = (r, qp)
    log("calibrated (bias-corrected per-channel)")

    r16, qp16 = runners["bf16"]
    for fr, fname in ((cal, "cal frame"), (held, "held-out")):
        out16 = jax.jit(r16.apply)(qp16, fr[None])
        for tag in ("i8tail", "int8"):
            r, qp = runners[tag]
            out = jax.jit(r.apply)(qp, fr[None])
            log(f"Q {tag:7s} vs bf16 on {fname}: {psnr(out, out16):.2f} dB")

    for tag in ("int8", "i8tail", "bf16"):
        r, qp = runners[tag]
        try:
            up = make_tiled_upscaler(r.apply, HW, HW, 16, 2,
                                     apply_fn_u8=r.apply_u8)
            gen_clip = jax.jit(lambda key: jax.random.randint(
                key, (16, 8, *HW, 3), 0, 256, jnp.int32).astype(jnp.uint8))
            clip = gen_clip(jax.random.PRNGKey(7))
            probe = jax.jit(lambda p, c: jnp.sum(up.clip_u8(p, c)
                                                 .astype(jnp.float32)))
            float(probe(qp, clip))
            t0 = time.perf_counter()
            for _ in range(6):
                float(probe(qp, clip))
            dt = (time.perf_counter() - t0) / 6
            log(f"clip_u8 {tag} 16x8: {dt * 1e3:7.1f} ms = "
                f"{128 / dt:6.2f} fps")
            del clip
            gc.collect()
        except Exception as e:
            log(f"clip {tag} FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
