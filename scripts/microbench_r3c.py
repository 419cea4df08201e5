"""Round-3 scout C: fused Pallas up conv + per-channel calibrated int8 +
the x4 270p->1080p operating point (the reference's own demo geometry,
example_frame_test.ipynb cells 2-10).

1. 540p x2: int8 tail piece + full clip_u8 with the fused up-conv kernel
   (ops/pallas/up_conv.py) and per-channel tail scales.
2. Quality on the real demo frame: int8 vs bf16 (per-channel calibration
   should beat round-2's per-tensor 37.3 dB).
3. x4 at 270p: clip_u8 fps for int8-trunk (r-blocked bf16 tail) and
   full-bf16 runners.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(*a):
    print(*a, flush=True)


def psnr(a, b, peak2=4.0):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(peak2 / max(mse, 1e-12))


def timeit(fn, *args, rounds=8):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(fn(*args))
    return (time.perf_counter() - t0) / rounds * 1e3


def fetch(f):
    return jax.jit(lambda q, v: jnp.sum(f(q, v).astype(jnp.float32)))


def real_frame(hw):
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert("RGB")
    arr = np.asarray(img.resize((hw[1], hw[0]), Image.BICUBIC),
                     np.float32) / 127.5 - 1.0
    return jnp.asarray(arr, jnp.float32)


def bench_clip(r, qp, tag, k, b, frame_hw, factor, rounds=6):
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    up = make_tiled_upscaler(r.apply, frame_hw, frame_hw, 16, factor,
                             apply_fn_u8=r.apply_u8)
    gen_clip = jax.jit(lambda key: jax.random.randint(
        key, (k, b, *frame_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))
    clip = gen_clip(jax.random.PRNGKey(7))
    probe = jax.jit(lambda p, c: jnp.sum(up.clip_u8(p, c)
                                         .astype(jnp.float32)))
    float(probe(qp, clip))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(qp, clip))
    dt = (time.perf_counter() - t0) / rounds
    log(f"clip_u8 {tag} {k}x{b}: {dt * 1e3:7.1f} ms = {k * b / dt:6.2f} fps")


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    log(f"devices: {jax.devices()}")

    # ---- 1+2: 540p x2 with fused up conv + per-channel scales ----------
    hw = (540, 960)
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=2,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *hw, 3), jnp.float32))["params"]
    real = real_frame(hw)

    r16 = FastOrigRunner(params, res_block_num=16, upscale_factor=2,
                         tile_hw=hw, quant=False)
    rq = FastOrigRunner(params, res_block_num=16, upscale_factor=2,
                        tile_hw=hw, quant=True)
    rt = FastOrigRunner(params, res_block_num=16, upscale_factor=2,
                        tile_hw=hw, quant="tail")
    assert rq.up_fused_ok and rt.up_fused_ok
    qp16 = jax.device_put(r16.qp)
    qp_cal = rq.calibrate(jax.device_put(rq.qp), real[None])
    qpt_cal = rt.calibrate(jax.device_put(rt.qp), real[None])
    log("per-channel calibrated (int8 + tail-only)")

    out16 = jax.jit(r16.apply)(qp16, real[None])
    out_q = jax.jit(rq.apply)(qp_cal, real[None])
    out_t = jax.jit(rt.apply)(qpt_cal, real[None])
    log(f"Q full int8 (per-channel) vs bf16 on real frame: "
        f"{psnr(out_q, out16):.2f} dB")
    log(f"Q i8tail    (per-channel) vs bf16 on real frame: "
        f"{psnr(out_t, out16):.2f} dB")

    x8 = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, *hw, 3)), jnp.float32))
    trunk8 = jax.jit(rq.apply_trunk)(qp_cal, jax.jit(rq.apply_stem)(qp_cal, x8))
    ms = timeit(fetch(rq.apply_tail), qp_cal, trunk8)
    log(f"int8 tail (fused up conv) b8: {ms:7.1f} ms/batch = "
        f"{(ms - 29) / 8:5.2f} ms/f")
    bench_clip(rq, qp_cal, "int8-540p", 16, 8, hw, 2)
    bench_clip(rt, qpt_cal, "i8tail-540p", 16, 8, hw, 2)
    bench_clip(r16, qp16, "bf16-540p", 16, 8, hw, 2)

    # ---- 3: x4 at 270p (reference demo geometry) ------------------------
    hw4 = (270, 480)
    model4 = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                          res_block_num=16, dtype=jnp.bfloat16,
                          phase_tail=True)
    params4 = model4.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *hw4, 3), jnp.float32))["params"]
    r4q = FastOrigRunner(params4, res_block_num=16, upscale_factor=4,
                         tile_hw=hw4, quant=True)
    r4b = FastOrigRunner(params4, res_block_num=16, upscale_factor=4,
                         tile_hw=hw4, quant=False)
    log(f"x4 runner: xpack_ready={r4q.xpack_ready} block0={r4q.block0} "
        f"extra={r4q.extra}")
    qp4q = jax.device_put(r4q.qp)
    qp4b = jax.device_put(r4b.qp)
    real4 = real_frame(hw4)
    out4b = jax.jit(r4b.apply)(qp4b, real4[None])
    out4q = jax.jit(r4q.apply)(qp4q, real4[None])
    log(f"x4 Q (int8 trunk, bf16 tail) vs bf16: "
        f"{psnr(out4q, out4b):.2f} dB")
    for k, b in ((16, 8), (8, 16)):
        try:
            bench_clip(r4q, qp4q, "int8trunk-270p-x4", k, b, hw4, 4)
        except Exception as e:
            log(f"x4 int8 {k}x{b} FAILED {type(e).__name__}: {str(e)[:120]}")
    try:
        bench_clip(r4b, qp4b, "bf16-270p-x4", 16, 8, hw4, 4)
    except Exception as e:
        log(f"x4 bf16 FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
