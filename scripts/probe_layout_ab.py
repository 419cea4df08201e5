"""Validate the round-3 probe + stage-0 layout changes on TPU.

Measures the official-protocol clip at both geometries/tail8 with
(a) the old full-sum probe vs (b) the honest barrier+sliver probe, on
the py-major stage-0 emit (x4 only; x2 has no stage 0). Also checks
held-out PSNR vs bf16 (must match the pre-change run: the lane
permutation is bit-exact).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BATCH = 8
CHUNKS = 16


def log(*a):
    print(*a, flush=True)


def force(out):
    out = jax.lax.optimization_barrier(out)
    sl = out[tuple(slice(None, None, max(1, d // 4)) for d in out.shape)]
    return jnp.sum(sl.astype(jnp.float32))


def timeit(name, probe, *args, frames, rounds=6):
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    log(f"{name:52s}: {ms:7.1f} ms = {frames / ms * 1e3:6.2f} fps")
    return ms


def run(factor):
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    hw = (540, 960) if factor == 2 else (270, 480)
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=factor,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *hw, 3), jnp.float32))["params"]

    def frame(name, interp):
        img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
        img = img.resize((hw[1], hw[0]), interp)
        return jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]

    cal = frame("input_480x270.png", Image.BICUBIC)
    ev = frame("eval_ukiyo_1080p.jpg", Image.LANCZOS)
    r_bf = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                          tile_hw=hw, quant=False)
    out_bf = jax.jit(r_bf.apply)(jax.device_put(r_bf.qp), ev)

    r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                       tile_hw=hw, quant="tail8")
    qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
    out_q = jax.jit(r.apply)(qp, ev)
    mse = float(np.mean((np.asarray(out_q, np.float32)
                         - np.asarray(out_bf, np.float32)) ** 2))
    log(f"x{factor} tail8 PSNR vs bf16 (held-out): "
        f"{10 * np.log10(4.0 / max(mse, 1e-12)):.2f} dB")

    up = make_tiled_upscaler(r.apply, hw, hw, 16, factor,
                             apply_fn_u8=r.apply_u8)
    clip = jax.jit(lambda k: jax.random.randint(
        k, (CHUNKS, BATCH, *hw, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8))(jax.random.PRNGKey(7))
    p_old = jax.jit(lambda p, c: jnp.sum(up.clip_u8(p, c)
                                         .astype(jnp.float32)))
    p_new = jax.jit(lambda p, c: force(up.clip_u8(p, c)))
    timeit(f"x{factor} tail8 clip {CHUNKS}x{BATCH} OLD full-sum probe",
           p_old, qp, clip, frames=CHUNKS * BATCH)
    timeit(f"x{factor} tail8 clip {CHUNKS}x{BATCH} NEW sliver probe",
           p_new, qp, clip, frames=CHUNKS * BATCH)


def main():
    log(f"devices: {jax.devices()}")
    for factor in (4, 2):
        run(factor)


if __name__ == "__main__":
    main()
