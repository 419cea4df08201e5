"""Mixed-precision trunk sweep at the x4 demo geometry (270p->1080p).

docs/PERF.md round-4 candidate 1: between tail8 (0 int8 trunk units,
59.3 fps / 53.8 dB) and full int8 (all 17 units, 60.7 fps / 44.6 dB
MISS) there is a fps/quality frontier; quantization error energy is
~linear in the quantized-conv count, so ~10 of 17 units should clear
the 46.3 dB budget gate while keeping most of the trunk speedup.

Protocol = bench.py's x4 secondary: calibrate on the demo frame
(docs/demo/input_480x270.png), held-out quality on the ukiyo frame,
streaming 16x8 uint8 clips, PSNR measured vs the bf16 runner.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/mix_trunk_sweep.py \
    [--factor 2] [mix:last4 mix:last8 ...]   (defaults below)

--factor 2 runs the OFFICIAL headline geometry (540p->1080p): the x4
sweep found the LAST blocks carry only ~15% of the full trunk's quant
error (docs/PERF.md mixed-precision section), so a small last-K at x2
may clear the gate where the linear-error estimate said none could.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

FACTOR = 4
if "--factor" in sys.argv:
    i = sys.argv.index("--factor")
    FACTOR = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]
HW = (270, 480) if FACTOR == 4 else (540, 960)
CLIP_CHUNKS, FRAME_BATCH = 16, 8
N_ROUNDS = 4
GATE_DB = 30.0 - 10 * np.log10(10 ** (0.1 / 10) - 1)  # 46.33


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(out):
    out = jax.lax.optimization_barrier(out)
    sl = out[tuple(slice(None, None, max(1, d // 4)) for d in out.shape)]
    return jnp.sum(sl.astype(jnp.float32))


def _frame(name, interp_name):
    import os

    from PIL import Image

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "demo", name)
    img = Image.open(path).convert("RGB")
    if img.size != (HW[1], HW[0]):
        img = img.resize((HW[1], HW[0]), getattr(Image, interp_name))
    return jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)


def main():
    specs = sys.argv[1:] or [
        "mix:last4", "mix:last8", "mix:last11", "mix:last13",
        "mix:first11",
    ]
    log(f"devices: {jax.devices()}; gate {GATE_DB:.2f} dB; specs {specs}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    cal = _frame("input_480x270.png", "BICUBIC")
    ev = _frame("eval_ukiyo_1080p.jpg", "LANCZOS")

    def build(quant):
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=FACTOR,
                           tile_hw=HW, quant=quant)
        qp = jax.device_put(r.qp)
        if r.tail_quant_ready or r.quant:
            qp = r.calibrate(qp, cal[None])
        return r, qp

    r_b, qp_b = build(False)
    out_b = jax.jit(r_b.apply)(qp_b, ev[None])
    float(jnp.sum(out_b.astype(jnp.float32)))  # force

    gen = jax.jit(lambda key: jax.random.randint(
        key, (CLIP_CHUNKS, FRAME_BATCH, *HW, 3), 0, 256,
        jnp.int32).astype(jnp.uint8))
    clip = gen(jax.random.PRNGKey(7))

    rows = []
    for spec in specs:
        t_build = time.perf_counter()
        try:
            r, qp = build(spec if spec.startswith("mix") else
                          (True if spec == "int8" else spec))
            out_q = jax.jit(r.apply)(qp, ev[None])
            mse = float(jnp.mean((out_q.astype(jnp.float32)
                                  - out_b.astype(jnp.float32)) ** 2))
            psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
            up = make_tiled_upscaler(r.apply, HW, HW, 16, FACTOR,
                                     apply_fn_u8=r.apply_u8)
            probe = jax.jit(lambda p, c: _force(up.clip_u8(p, c)))
            float(probe(qp, clip))  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(N_ROUNDS):
                float(probe(qp, clip))
            dt = (time.perf_counter() - t0) / N_ROUNDS
            fps = CLIP_CHUNKS * FRAME_BATCH / dt
            ok = "PASS" if psnr >= GATE_DB else "MISS"
            log(f"{spec}: {fps:.2f} fps, {psnr:.2f} dB vs bf16 [{ok}] "
                f"(build+cal+compile {time.perf_counter() - t_build:.0f}s)")
            rows.append((spec, fps, psnr))
        except Exception as e:
            log(f"{spec} FAILED: {type(e).__name__}: {e}")
    log("spec\tfps\tpsnr")
    for spec, fps, psnr in rows:
        log(f"{spec}\t{fps:.2f}\t{psnr:.2f}")
    compliant = [(f, s) for s, f, p in rows if p >= GATE_DB]
    if compliant:
        f, s = max(compliant)
        log(f"best compliant: {s} at {f:.2f} fps")


if __name__ == "__main__":
    main()
