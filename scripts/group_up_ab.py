"""In-graph A/B: grouped stage-1 (VCGU_GROUP_UP=1, two row-support
union-window convs) vs the four-conv exact-phase form, tail8/tail at
the x4 demo geometry and x2 flagship. Outputs are bit-identical by
construction (tests/test_fused_conv.py grouped test), so this measures
speed only: full apply_u8 + the official-protocol 16x8 streaming clip.
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
CHUNKS = 16


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, frames, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    log(f"{name:48s}: {ms:7.1f} ms = {(ms - RPC_MS) / frames:6.2f} ms/f "
        f"({frames / ms * 1e3:6.2f} fps raw)")
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
    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))
    clip = jax.jit(lambda k: jax.random.randint(
        k, (CHUNKS, BATCH, *hw, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8))(jax.random.PRNGKey(7))

    for quant in ("tail8", "tail"):
        for grouped in ("0", "1"):
            os.environ["VCGU_EXACT_UP"] = "1"
            os.environ["VCGU_GROUP_UP"] = grouped
            r = FastOrigRunner(params, res_block_num=16,
                               upscale_factor=factor, tile_hw=hw,
                               quant=quant)
            assert (r.up_groups is not None) == (grouped == "1")
            qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
            tag = "group" if grouped == "1" else "phase"
            timeit(f"x{factor} {quant:5s} {tag} apply_u8 b{BATCH}",
                   r.apply_u8, qp, x, frames=BATCH)
            up = make_tiled_upscaler(r.apply, hw, hw, 16, factor,
                                     apply_fn_u8=r.apply_u8)
            timeit(f"x{factor} {quant:5s} {tag} clip {CHUNKS}x{BATCH}",
                   up.clip_u8, qp, clip, frames=CHUNKS * BATCH, rounds=4)


def main():
    log(f"devices: {jax.devices()}")
    for factor in (4, 2):
        run(factor)


if __name__ == "__main__":
    main()
