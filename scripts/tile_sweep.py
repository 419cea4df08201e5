"""Tile-blend quality budget at flagship scale on TPU (VERDICT r1 item 5).

Runs the 16-block flagship through the real multi-tile path (270x480
tiles on 540p, overlap sweep) and compares each tiled output against the
whole-frame output: PSNR must meet the <=0.1 dB BASELINE budget — i.e.
the blend error must be negligible relative to the signal. Also times
each config so bench.py's operating point (whole-frame tile) is justified
by data rather than assumption.

Note InstanceNorm makes tiling *statistically* non-exact by design (each
tile normalizes over its own support); the sweep measures the combined
halo+statistics effect at the real model scale, replacing the toy-model
CPU evidence (tests/test_tiles.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

FRAME_HW = (540, 960)
FACTOR = 2


def log(*a):
    print(*a, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 270, 480, 3), jnp.float32))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        variables["params"])
    apply_fn = lambda p, x: model.apply({"params": p}, x)

    frame = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (*FRAME_HW, 3)), jnp.float32)

    def run(tile_hw, overlap):
        up = make_tiled_upscaler(apply_fn, FRAME_HW, tile_hw, overlap,
                                 FACTOR)
        f = jax.jit(lambda p, x: up(p, x))
        probe = jax.jit(lambda p, x: jnp.sum(up(p, x).astype(jnp.float32)))
        t0 = time.perf_counter()
        out = np.asarray(f(params, frame), np.float32)
        log(f"  tile={tile_hw} ov={overlap}: compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        float(probe(params, frame))
        t0 = time.perf_counter()
        for _ in range(4):
            float(probe(params, frame))
        ms = (time.perf_counter() - t0) / 4 * 1e3
        return out, ms

    whole, ms_whole = run(FRAME_HW, 16)
    log(f"whole-frame: {ms_whole:.1f} ms/frame")
    for ov in (8, 16, 32, 48):
        tiled, ms = run((270, 480), ov)
        log(f"RESULT tile=270x480 overlap={ov}: PSNR vs whole "
            f"{psnr(tiled, whole):.2f} dB, {ms:.1f} ms/frame "
            f"(whole={ms_whole:.1f})")


if __name__ == "__main__":
    main()
