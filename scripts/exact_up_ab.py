"""In-graph A/B: exact-phase stage-1 (VCGU_EXACT_UP=1, four true-tap
convs) vs the W-pair-packed form, tail/tail8 at both product
geometries. Full apply_u8 timing + held-out PSNR vs the bf16 path
(bench protocol: calibrate on the demo frame, eval on the ukiyo frame).
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


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / BATCH
    log(f"{name:52s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f")
    return per_f


def run(factor):
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

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

    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    for quant in ("tail", "tail8"):
        for exact in ("0", "1"):
            os.environ["VCGU_EXACT_UP"] = exact
            r = FastOrigRunner(params, res_block_num=16,
                               upscale_factor=factor, tile_hw=hw,
                               quant=quant)
            qp = r.calibrate(jax.device_put(r.qp), jax.device_put(cal))
            out_q = jax.jit(r.apply)(qp, ev)
            mse = float(np.mean((np.asarray(out_q, np.float32)
                                 - np.asarray(out_bf, np.float32)) ** 2))
            psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
            tag = "exact" if exact == "1" else "pair "
            timeit(f"x{factor} {quant:5s} {tag} apply_u8 "
                   f"[{psnr:.2f} dB vs bf16]", r.apply_u8, qp, x)


def main():
    log(f"devices: {jax.devices()}")
    for factor in (4, 2):
        run(factor)


if __name__ == "__main__":
    main()
