"""x4 'tail8:s1' (bf16 stage-0) probe: quality + fps, bench protocol.

The round-5 margin probe localized the whole trained-weights tail8
deficit to the s0 quantization; this mode removes s0 entirely for the
price of a bf16 stage-0 up conv at LR. Measures held-out PSNR vs bf16
and streaming-clip fps for tail8 (control), tail8:s1, and trunkonly
(quality control) on the trained x4 checkpoint.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "docs", "demo")


def log(*a):
    print(*a, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def _force(out):
    out = jax.lax.optimization_barrier(out)
    sl = out[tuple(slice(None, None, max(1, d // 4)) for d in out.shape)]
    return jnp.sum(sl.astype(jnp.float32))


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
        load_demo_generator_params,
    )
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    factor = 4
    hw = (270, 480)
    log(f"devices: {jax.devices()}  x{factor} {hw}")
    params = load_demo_generator_params(factor)
    assert params is not None

    def unit(img):
        return np.asarray(img, np.float32) / 127.5 - 1.0

    cal = jnp.asarray(unit(Image.open(os.path.join(DEMO, "input_480x270.png")
                                      ).convert("RGB").resize(
        (hw[1], hw[0]), Image.BICUBIC)))[None]
    evs = {}
    for name in ("eval_ukiyo_1080p.jpg", "eval_frame_b.jpg",
                 "eval_frame_c.jpg"):
        p = os.path.join(DEMO, name)
        if os.path.exists(p):
            evs[name] = jnp.asarray(unit(Image.open(p).convert("RGB").resize(
                (hw[1], hw[0]), Image.LANCZOS)))[None]

    r_b = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                         tile_hw=hw, quant=False)
    qpb = jax.device_put(r_b.qp)
    fnb = jax.jit(r_b.apply)
    refs = {k: fnb(qpb, v) for k, v in evs.items()}

    for quant in ("tail8:s1", "tail8", "trunkonly"):
        q = "trunk" if quant == "trunkonly" else quant
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                           tile_hw=hw, quant=q)
        t0 = time.perf_counter()
        qp = r.calibrate(jax.device_put(r.qp), cal)
        t_cal = time.perf_counter() - t0
        fn = jax.jit(r.apply)
        ps = {k: psnr(fn(qp, v), refs[k]) for k, v in evs.items()}
        pmin = min(ps.values())
        log(f"{quant:10s} clip={getattr(r, 'tail_clip_selected', None)}: "
            f"min {pmin:.2f} dB over {len(ps)} frames "
            f"({['%.2f' % v for v in ps.values()]}) cal {t_cal:.0f}s")
        # streaming clip fps (bench protocol)
        up = make_tiled_upscaler(r.apply, hw, hw, 16, factor,
                                 apply_fn_u8=r.apply_u8)
        gen = jax.jit(lambda key: jax.random.randint(
            key, (16, 8, *hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))
        clip = gen(jax.random.PRNGKey(7))
        probe = jax.jit(lambda p, c: _force(up.clip_u8(p, c)))
        float(probe(qp, clip))
        t0 = time.perf_counter()
        for _ in range(4):
            float(probe(qp, clip))
        dt = (time.perf_counter() - t0) / 4
        log(f"{quant:10s} clip 16x8: {dt * 1e3:.1f} ms = "
            f"{16 * 8 / dt:.2f} fps")


if __name__ == "__main__":
    main()
