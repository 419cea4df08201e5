"""s0 (trunk-output) channel statistics + bit-depth headroom (round 5).

The margin probe localized the whole x4 tail8 deficit to the s0 quant
(trunk output -> int8 before the stage-0 up conv) with NO eval/cal
distribution shift. Two follow-ups measured here on the trained x4
checkpoint:

1. per-channel stats of the s0 stream (mean/std/amax over space): large
   |mean|/range ratios => an asymmetric (zero-point) s0 quantizer — the
   head-input treatment, exact for a linear consumer — buys real bits;
2. simulated s0 at 8..12 bits (everything else exact): the ceiling any
   s0 grid trick can reach, and how many effective bits the budget gate
   needs.
"""

import os
import sys

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


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
        load_demo_generator_params,
    )

    factor = int(os.environ.get("VCGU_PROBE_FACTOR", "4"))
    hw = (270, 480) if factor == 4 else (540, 960)
    log(f"devices: {jax.devices()}  x{factor} {hw}")
    params = load_demo_generator_params(factor)
    assert params is not None

    def unit(img):
        return np.asarray(img, np.float32) / 127.5 - 1.0

    cal = jnp.asarray(unit(Image.open(os.path.join(DEMO, "input_480x270.png")
                                      ).convert("RGB").resize(
        (hw[1], hw[0]), Image.BICUBIC)))[None]
    ev = jnp.asarray(unit(Image.open(
        os.path.join(DEMO, "eval_ukiyo_1080p.jpg")).convert("RGB").resize(
        (hw[1], hw[0]), Image.LANCZOS)))[None]

    r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                       tile_hw=hw, quant="tail8")
    qp = jax.device_put(r.qp)

    @jax.jit
    def s0_stream(qp, x):
        trunk = r.apply_trunk(qp, r.apply_stem(qp, x))
        n, h, wp_, cp = trunk.shape
        return trunk.reshape(n, h, wp_ * r.pack, r.filters
                             ).astype(jnp.float32)

    y = np.asarray(jax.device_get(s0_stream(qp, cal)))[0]
    mean = y.mean(axis=(0, 1))
    std = y.std(axis=(0, 1))
    amax = np.abs(y).max(axis=(0, 1))
    lo, hi = y.min(axis=(0, 1)), y.max(axis=(0, 1))
    half = (hi - lo) / 2.0
    gain_db = 20 * np.log10(np.maximum(amax, 1e-9)
                            / np.maximum(half, 1e-9))
    log(f"s0 channels: amax med {np.median(amax):.3f} max {amax.max():.3f}"
        f"  |mean|/amax med {np.median(np.abs(mean) / amax):.3f}"
        f"  amax/std med {np.median(amax / np.maximum(std, 1e-9)):.1f}"
        f"  asym gain dB: med {np.median(gain_db):.2f}"
        f" p90 {np.percentile(gain_db, 90):.2f} max {gain_db.max():.2f}")
    # top-5 widest channels
    order = np.argsort(-amax)[:5]
    for c in order:
        log(f"  ch{c:2d}: amax {amax[c]:8.3f} mean {mean[c]:8.3f} "
            f"std {std[c]:7.3f} lo {lo[c]:8.3f} hi {hi[c]:8.3f}")

    # bit-depth headroom: quantize ONLY s0 (everything else bf16-exact)
    r_b = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                         tile_hw=hw, quant=False)
    qpb = jax.device_put(r_b.qp)
    ref = jax.jit(r_b.apply)(qpb, ev)
    y_ev = s0_stream(qp, ev)

    def tail_from(y4):
        # run the bf16 tail on a modified s0 stream by swapping the
        # trunk result into the bf16 runner's tail
        n, h, w, c = y4.shape
        t = y4.reshape(n, h, w // r_b.pack, c * r_b.pack).astype(jnp.bfloat16)
        return r_b.apply_tail(qpb, t)

    amax_j = jnp.asarray(amax)  # cal-frame scales (the deploy protocol)
    for bits in (8, 9, 10, 11, 12):
        q = 2.0 ** (bits - 1) - 1
        s = q / jnp.maximum(amax_j, 1e-6)

        @jax.jit
        def sim(y):
            yq = jnp.clip(jnp.round(y * s), -q, q) / s
            return tail_from(yq)

        p = psnr(sim(y_ev), ref)
        log(f"s0 at {bits:2d} bits (cal scales, sym): eval {p:.2f} dB")
    # asymmetric 8-bit: zp from cal lo/hi
    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
    s_a = 254.0 / jnp.maximum(hi_j - lo_j, 1e-6)
    zp = jnp.round((hi_j + lo_j) / 2.0 * s_a)

    @jax.jit
    def sim_asym(y):
        yq = (jnp.clip(jnp.round(y * s_a - zp), -127, 127) + zp) / s_a
        return tail_from(yq)

    p = psnr(sim_asym(y_ev), ref)
    log(f"s0 at 8 bits ASYMMETRIC (cal zp): eval {p:.2f} dB")


if __name__ == "__main__":
    main()
