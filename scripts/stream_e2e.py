"""End-to-end streaming CLI measurement (VERDICT r2 item 4).

Drives the REAL product path — ``cli.upscale`` with default streaming
dispatch — on a JPEG image-dir clip at the flagship geometry
(540p -> 1080p, x2, whole-frame tile, --turbo-tail), decode -> uint8
host->device superbatches -> uint8 out -> y4m sink, and reports the
sustained end-to-end fps to compare against bench.py's device-side
number ("Done" = >= ~80% of it).

Setup is fabricated, not trained: a flagship-config run dir +
random-init checkpoint (timing does not depend on weight values), and a
frame dir synthesized from the committed demo artifact (real JPEG decode
cost per frame). Replaces the reference's per-frame predict loop
measurement (upscaler_mini_testing.ipynb cell 18).
"""

import os
import shutil
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np
from PIL import Image

ROOT = "/tmp/vcgu_e2e"
N_FRAMES = 512          # 4 superbatches of 16x8: 1 warmup + 3 timed
FRAME_HW = (540, 960)


def log(*a):
    print(*a, flush=True)


def fabricate_run():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
    from video_cycle_gan_upscaling_tpu.utils.config import RunConfig

    cfg = RunConfig(output_root=ROOT)
    cfg.model.generator = "orig"
    cfg.model.res_block_num = 16
    cfg.model.filters = 64
    cfg.model.kernel_size = 5
    cfg.train.downscale_factor = 2
    cfg.train.output_height = FRAME_HW[0] * 2
    cfg.train.output_width = FRAME_HW[1] * 2
    cfg.train.compute_dtype = "bfloat16"
    dirs = cfg.make_run_dirs()
    cfg.save(os.path.join(dirs["losses"], "parameters.json"))

    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=2,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    CheckpointManager(dirs["models"]).save_best({"params": params})
    return dirs["losses"]


def fabricate_frames():
    """N_FRAMES JPEGs at 960x540 from the demo artifact (shifted crops so
    files differ; decode cost is what matters)."""
    fdir = os.path.join(ROOT, "frames")
    if os.path.isdir(fdir) and len(os.listdir(fdir)) == N_FRAMES:
        return fdir
    shutil.rmtree(fdir, ignore_errors=True)
    os.makedirs(fdir)
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert("RGB")
    big = img.resize((FRAME_HW[1] + 64, FRAME_HW[0] + 64), Image.BICUBIC)
    arr = np.asarray(big)
    for i in range(N_FRAMES):
        dx, dy = (i * 7) % 64, (i * 13) % 64
        crop = arr[dy:dy + FRAME_HW[0], dx:dx + FRAME_HW[1]]
        Image.fromarray(crop).save(
            os.path.join(fdir, f"im_{i:05d}.jpg"), quality=92)
    return fdir


def main():
    log(f"devices: {jax.devices()}")
    run_dir = fabricate_run()
    fdir = fabricate_frames()
    out_y4m = os.path.join(ROOT, "out.y4m")
    if os.path.exists(out_y4m):
        os.remove(out_y4m)

    from video_cycle_gan_upscaling_tpu.cli import upscale

    for tag, extra in (("i8tail", ["--turbo-tail"]), ("bf16", [])):
        t0 = time.perf_counter()
        result = upscale.main([
            "-r", run_dir, "-i", fdir, "-o", out_y4m, "--best",
            "--frame-height", str(FRAME_HW[0]),
            "--frame-width", str(FRAME_HW[1]),
            "--tile-height", str(FRAME_HW[0]),
            "--tile-width", str(FRAME_HW[1]),
            "--max-frames", str(N_FRAMES),
        ] + extra)
        wall = time.perf_counter() - t0
        sz = os.path.getsize(out_y4m) / 1e6 if os.path.exists(out_y4m) else 0
        log(f"CLI e2e {tag}: sustained {result['fps']:.2f} fps "
            f"({result['frames']} frames; wall {wall:.1f}s incl. compile; "
            f"y4m sink {sz:.0f} MB)")
        os.remove(out_y4m)


if __name__ == "__main__":
    main()
