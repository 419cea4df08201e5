"""Round-3 scout B: the new uint8 streaming graph + int8 quality split.

1. clip_u8 fps (single-tile merge bypass, uint8 in, codec-u8 emit folded
   into the head epilogue) at 16x8 and 32x4, int8 and bf16 — the new
   headline candidates.
2. int8 quality ISOLATION on a real frame (the committed demo artifact):
   full int8 vs bf16, int8-trunk-only vs bf16, int8-tail-only vs bf16 —
   decides where calibrated-quantization effort buys dB.
3. R of the (random-weights) bench model vs a real-GT pair
   (bicubic_1080p.png LANCZOS-downscaled to 540p -> model -> PSNR vs the
   1080p original) — context for the budget-derived gate.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

FRAME_HW = (540, 960)
FACTOR = 2


def log(*a):
    print(*a, flush=True)


def psnr(a, b, peak2=4.0):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(peak2 / max(mse, 1e-12))


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *FRAME_HW, 3), jnp.float32))
    params32 = variables["params"]

    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert("RGB")
    real = np.asarray(img.resize((FRAME_HW[1], FRAME_HW[0]), Image.BICUBIC),
                      np.float32) / 127.5 - 1.0
    real = jnp.asarray(real, jnp.float32)

    r16 = FastOrigRunner(params32, res_block_num=16, upscale_factor=FACTOR,
                         tile_hw=FRAME_HW, quant=False)
    rq = FastOrigRunner(params32, res_block_num=16, upscale_factor=FACTOR,
                        tile_hw=FRAME_HW, quant=True)
    qp16 = jax.device_put(r16.qp)
    qp_uncal = jax.device_put(rq.qp)
    qp_cal = rq.calibrate(qp_uncal, real[None])
    log("calibrated on real frame")

    # ---- 2. quality isolation on the real frame -----------------------
    out16 = jax.jit(r16.apply)(qp16, real[None])
    out_q_full = jax.jit(rq.apply)(qp_cal, real[None])
    out_q_trunk = jax.jit(rq.apply)(qp_uncal, real[None])  # bf16 tail
    trunk16 = jax.jit(r16.apply_trunk)(qp16, jax.jit(r16.apply_stem)(qp16, real[None]))
    out_q_tail = jax.jit(rq.apply_tail)(qp_cal, trunk16)   # bf16 trunk
    log(f"Q full  (int8 trunk+tail) vs bf16: {psnr(out_q_full, out16):.2f} dB")
    log(f"Q trunk (int8 trunk, bf16 tail)  : {psnr(out_q_trunk, out16):.2f} dB")
    log(f"Q tail  (bf16 trunk, int8 tail)  : {psnr(out_q_tail, out16):.2f} dB")

    # ---- 3. R of the bench model on a real GT pair ---------------------
    gt = Image.open("/root/repo/docs/demo/bicubic_1080p.png").convert("RGB")
    gt_hr = np.asarray(gt, np.float32) / 127.5 - 1.0          # 1080x1920
    lr = np.asarray(gt.resize((960, 540), Image.LANCZOS),
                    np.float32) / 127.5 - 1.0
    out_r = jax.jit(r16.apply)(qp16, jnp.asarray(lr)[None])
    log(f"R (bf16 model vs GT, random weights): "
        f"{psnr(out_r[0], gt_hr):.2f} dB")

    # ---- 1. streaming clip_u8 fps --------------------------------------
    def bench_clip(r, qp, tag, k, b, rounds=6):
        up = make_tiled_upscaler(r.apply, FRAME_HW, FRAME_HW, 16, FACTOR,
                                 apply_fn_u8=r.apply_u8)
        gen_clip = jax.jit(lambda key: jax.random.randint(
            key, (k, b, *FRAME_HW, 3), 0, 256, jnp.int32).astype(jnp.uint8))
        clip = gen_clip(jax.random.PRNGKey(7))
        probe = jax.jit(lambda p, c: jnp.sum(up.clip_u8(p, c)
                                             .astype(jnp.float32)))
        float(probe(qp, clip))
        t0 = time.perf_counter()
        for _ in range(rounds):
            float(probe(qp, clip))
        dt = (time.perf_counter() - t0) / rounds
        log(f"clip_u8 {tag} {k}x{b}: {dt * 1e3:7.1f} ms = "
            f"{k * b / dt:6.2f} fps")

    bench_clip(rq, qp_cal, "int8", 16, 8)
    bench_clip(rq, qp_cal, "int8", 32, 4)
    bench_clip(r16, qp16, "bf16", 16, 8)


if __name__ == "__main__":
    main()
