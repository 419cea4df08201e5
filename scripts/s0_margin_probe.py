"""x4 tail8 inversion diagnostic (docs/PERF.md round-5 lead 1a).

Hypothesis: tail8 (bf16 trunk) MISSes at x4 because the stage scales are
measured on the calibration frame and the held-out frame's activations
EXCEED them (under-coverage -> clipping), while an int8 trunk (mix)
bounds eval activations to the calibrated grid — hence the tail8 40.83 <
mix 44.53 inversion despite mix quantizing strictly more.

Test: calibrate tail8 normally (clip=1.0 fixed), then selectively
INFLATE one stage's amax vector by a margin factor and measure held-out
PSNR. If under-coverage is real, some stage's margin row beats 1.0 on
EVAL (impossible for any on-calibration selection to find, since cal
never sees the wider range). Stages: s0 = trunk output quant, mid = x4
stage-0 canonical stream, s1 = final up-conv output, lohi = head input
(asymmetric zp quantizer).
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


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
        load_demo_generator_params,
    )

    factor = int(os.environ.get("VCGU_PROBE_FACTOR", "4"))
    quant = os.environ.get("VCGU_PROBE_QUANT", "tail8")
    hw = (270, 480) if factor == 4 else (540, 960)
    log(f"devices: {jax.devices()}  x{factor} {hw} quant={quant}")
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

    r_b = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                         tile_hw=hw, quant=False)
    out_ref_ev = jax.jit(r_b.apply)(jax.device_put(r_b.qp), ev)
    out_ref_cal = jax.jit(r_b.apply)(jax.device_put(r_b.qp), cal)

    r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                       tile_hw=hw, quant=quant)
    qp0 = jax.device_put(r.qp)
    if r.quant:  # mixed/trunk modes: per-channel trunk refold first
        # trunk-only calibration via the public path, tail pinned to 1.0
        os.environ["VCGU_TAIL_CLIP"] = "1.0"
        qp0 = r.calibrate(qp0, cal)
        # amaxes below re-measured on the calibrated trunk
    am = [np.asarray(a, np.float32)
          for a in jax.device_get(jax.jit(r._tail_amax)(qp0, cal))]
    fn = jax.jit(r.apply)

    names = {0: "s0(trunk-out)", 1: "s1(up-out)", 2: "lohi(head-in)"}
    if len(am) > 3:
        names[3] = "mid(stage0-out)"

    base = None
    for idx in sorted(names):
        for f in (1.0, 1.15, 1.3, 1.5, 2.0, 3.0):
            if f == 1.0 and base is not None:
                continue
            mod = [a.copy() for a in am]
            mod[idx] = am[idx] * f
            t0 = time.perf_counter()
            qp = jax.device_put(
                r._finish_tail_calibration(dict(qp0), mod, [cal]))
            p_ev = psnr(fn(qp, ev), out_ref_ev)
            p_cal = psnr(fn(qp, cal), out_ref_cal)
            row = (f"{names[idx]:16s} x{f:<4}: eval {p_ev:6.2f} dB  "
                   f"cal {p_cal:6.2f} dB  ({time.perf_counter() - t0:.0f}s)")
            log(row)
            if f == 1.0:
                base = row
    log(f"baseline row: {base}")


if __name__ == "__main__":
    main()
