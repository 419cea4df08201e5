"""Round-3 scout E: the x4 270p->1080p operating point — the reference's
own demo geometry (example_frame_test.ipynb cells 2-10: BtoA_00286 crop
480x270 -> 1920x1080).

With the chained x-pack x4 tail (fast_infer.py: stage-0 pair up conv at
LR -> one transpose to the canonical 2x stream -> the x2 tail machinery
at 540p), all three product modes run at x4: bf16, hybrid i8tail
(budget mode) and full int8 turbo. Protocol mirrors bench.py: calibrate
on the demo frame, evaluate PSNR on the held-out ukiyo frame, stream
16x8 uint8 clips.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

HW = (270, 480)
GATE_DB = 46.3


def log(*a):
    print(*a, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def frame(name):
    img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
    if img.size != (HW[1], HW[0]):
        img = img.resize((HW[1], HW[0]), Image.LANCZOS)
    return jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    cal = frame("input_480x270.png")
    ev = frame("eval_ukiyo_1080p.jpg")

    runners = {}
    for tag, quant in (("bf16", False), ("i8tail", "tail"), ("int8", True)):
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                           tile_hw=HW, quant=quant)
        qp = jax.device_put(r.qp)
        if r.tail_quant_ready or r.quant:
            qp = r.calibrate(qp, cal[None])
        runners[tag] = (r, qp)
    log(f"x4 runner: xpack_ready={runners['i8tail'][0].xpack_ready}")

    outs = {tag: jax.jit(r.apply)(qp, ev[None])
            for tag, (r, qp) in runners.items()}
    for tag in ("i8tail", "int8"):
        q = psnr(outs[tag], outs["bf16"])
        log(f"x4 Q {tag:7s} vs bf16 (held-out): {q:6.2f} dB "
            f"[{'PASS' if q >= GATE_DB else 'MISS'} gate {GATE_DB}]")

    for tag, (r, qp) in runners.items():
        for k, b in ((16, 8), (8, 16)):
            try:
                up = make_tiled_upscaler(r.apply, HW, HW, 16, 4,
                                         apply_fn_u8=r.apply_u8)
                gen = jax.jit(lambda key: jax.random.randint(
                    key, (k, b, *HW, 3), 0, 256, jnp.int32
                ).astype(jnp.uint8))
                clip = gen(jax.random.PRNGKey(7))
                probe = jax.jit(lambda p, c: jnp.sum(
                    up.clip_u8(p, c).astype(jnp.float32)))
                float(probe(qp, clip))
                t0 = time.perf_counter()
                for _ in range(6):
                    float(probe(qp, clip))
                dt = (time.perf_counter() - t0) / 6
                log(f"x4 clip_u8 {tag} {k}x{b}: {dt * 1e3:7.1f} ms = "
                    f"{k * b / dt:6.2f} fps")
                break  # one schedule per tag unless it failed
            except Exception as e:
                log(f"x4 {tag} {k}x{b} FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
