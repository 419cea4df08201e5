"""x4 tail scale-margin probe: can a fixed clip >= 1.0 rescue the
eval_frame_b collapse of the int8-tail modes?

Round-5 finding: tail8:s1 measures 52.6/52.4 dB on two held-out frames
but 31.1 on eval_frame_b (a stored model-output frame) — and plain tail8
collapses there too (29.8) while trunkonly doesn't (52.4). The tail
scales (mid/s1/lohi) measured on the BtoA calibration frame under-cover
frame_b's activations; the auto clip (selected on cal MSE) makes it
worse. This sweeps a FIXED global tail clip through 1.0..2.0 (>1 =
safety margin) for tail8:s1 and tail8, reporting per-frame PSNR.
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
    evs = {}
    for name in ("eval_ukiyo_1080p.jpg", "eval_frame_b.jpg",
                 "eval_frame_c.jpg"):
        evs[name[5:-4]] = jnp.asarray(unit(
            Image.open(os.path.join(DEMO, name)).convert("RGB").resize(
                (hw[1], hw[0]), Image.LANCZOS)))[None]

    r_b = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                         tile_hw=hw, quant=False)
    qpb = jax.device_put(r_b.qp)
    fnb = jax.jit(r_b.apply)
    refs = {k: fnb(qpb, v) for k, v in evs.items()}

    quants = os.environ.get("VCGU_PROBE_QUANTS", "tail8:s1,tail8").split(",")
    clips = [float(c) for c in os.environ.get(
        "VCGU_PROBE_CLIPS", "1.0,1.3,1.6,2.0").split(",")]
    for quant in quants:
        for clip in clips:
            os.environ["VCGU_TAIL_CLIP"] = str(clip)
            r = FastOrigRunner(params, res_block_num=16,
                               upscale_factor=factor, tile_hw=hw,
                               quant=quant)
            qp = r.calibrate(jax.device_put(r.qp), cal)
            fn = jax.jit(r.apply)
            ps = {k: psnr(fn(qp, v), refs[k]) for k, v in evs.items()}
            log(f"{quant:10s} clip={clip:<4}: min {min(ps.values()):6.2f} "
                f"dB  ({', '.join(f'{k}={v:.2f}' for k, v in ps.items())})")


if __name__ == "__main__":
    main()
