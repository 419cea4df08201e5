"""Multi-frame calibration probe (docs/PERF.md round-5 candidate 1d).

Hypothesis: the x4 tail-W8A8 modes MISS on trained weights partly from
calibration DISTRIBUTION SHIFT — per-channel amaxes measured on the one
demo frame under-cover the held-out frame's activation ranges when the
trunk is bf16 (an int8 trunk bounds eval activations to the calibrated
grid, which is consistent with the tail8 40.83 < mix 44.53 inversion).
Test: calibrate on an AUGMENTED multi-frame batch (demo frame + flips +
a bicubic_1080p crop) instead, same held-out ukiyo gate.
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

    base = Image.open(os.path.join(DEMO, "input_480x270.png")
                      ).convert("RGB").resize((hw[1], hw[0]), Image.BICUBIC)
    bi = Image.open(os.path.join(DEMO, "bicubic_1080p.png")).convert("RGB")
    crop = bi.crop((0, 0, hw[1] * 2, hw[0] * 2)).resize((hw[1], hw[0]),
                                                        Image.LANCZOS)
    cal1 = jnp.asarray(unit(base))[None]
    cal3 = jnp.asarray(np.stack([
        unit(base), unit(base.transpose(Image.FLIP_LEFT_RIGHT)),
        unit(crop)]))
    ev = Image.open(os.path.join(DEMO, "eval_ukiyo_1080p.jpg")
                    ).convert("RGB").resize((hw[1], hw[0]), Image.LANCZOS)
    ev = jnp.asarray(unit(ev))[None]

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        return 10 * np.log10(4.0 / max(mse, 1e-12))

    r_b = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                         tile_hw=hw, quant=False)
    out_ref = jax.jit(r_b.apply)(jax.device_put(r_b.qp), ev)

    for quant in ("tail8", "mix:last14", "tail"):
        for tag, cal in (("1-frame", cal1), ("3-frame-aug", cal3)):
            r = FastOrigRunner(params, res_block_num=16,
                               upscale_factor=factor, tile_hw=hw,
                               quant=quant)
            t0 = time.perf_counter()
            qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
            out = jax.jit(r.apply)(qp, ev)
            log(f"x{factor} {quant:10s} cal={tag:12s} "
                f"clip={getattr(r, 'tail_clip_selected', None)}: "
                f"{psnr(out, out_ref):.2f} dB vs bf16 "
                f"({time.perf_counter() - t0:.0f}s)")


if __name__ == "__main__":
    main()
