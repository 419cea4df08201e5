"""Calibration-batch augmentation A/B: x2 tail8 misses the budget gate
by 0.03 dB (46.27 vs 46.3). Per-channel scales and bias corrections are
measured on ONE calibration frame; this tests whether a richer
calibration batch (shifted / flipped copies of the SAME calibration
content — the held-out eval frame stays held out) closes the gap.
Also reports the hybrid and x4 numbers under the same augmentation."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(*a):
    print(*a, flush=True)


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    log(f"devices: {jax.devices()}")
    for factor in (2, 4):
        hw = (540, 960) if factor == 2 else (270, 480)
        model = UpscalerOrig(kernel_size=5, filters=64,
                             upscale_factor=factor, res_block_num=16,
                             dtype=jnp.bfloat16, phase_tail=True)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *hw, 3), jnp.float32))["params"]

        def frame(name, interp):
            img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
            img = img.resize((hw[1], hw[0]), interp)
            return np.asarray(img, np.float32) / 127.5 - 1.0

        cal = frame("input_480x270.png", Image.BICUBIC)
        ev = jnp.asarray(frame("eval_ukiyo_1080p.jpg", Image.LANCZOS))[None]

        batches = {
            "1 frame (current)": np.stack([cal]),
            "+hflip": np.stack([cal, cal[:, ::-1]]),
            "+hflip+vflip+rolls": np.stack(
                [cal, cal[:, ::-1], cal[::-1],
                 np.roll(cal, 7, axis=1), np.roll(cal, 13, axis=0)]),
        }

        r_bf = FastOrigRunner(params, res_block_num=16,
                              upscale_factor=factor, tile_hw=hw,
                              quant=False)
        out_bf = jax.jit(r_bf.apply)(jax.device_put(r_bf.qp), ev)

        for quant in ("tail8", "tail"):
            for tag, batch in batches.items():
                r = FastOrigRunner(params, res_block_num=16,
                                   upscale_factor=factor, tile_hw=hw,
                                   quant=quant)
                qp = r.calibrate(jax.device_put(r.qp),
                                 jax.device_put(jnp.asarray(batch)))
                out_q = jax.jit(r.apply)(qp, ev)
                mse = float(np.mean((np.asarray(out_q, np.float32)
                                     - np.asarray(out_bf, np.float32)) ** 2))
                psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
                log(f"x{factor} {quant:5s} cal[{tag:20s}]: "
                    f"{psnr:.2f} dB vs bf16 (gate 46.3)")


if __name__ == "__main__":
    main()
