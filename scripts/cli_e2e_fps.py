"""End-to-end product-path fps: the REAL upscale CLI on an image dir.

VERDICT r2 item 4's done-criterion: the CLI on an image-dir clip should
sustain >= ~80% of bench.py's number, measured decode -> uint8
host->device -> streaming chunked dispatch -> fetch (and optionally
-> JPEG sink). This drives cli.upscale.main itself (not the bench
harness) against a fabricated flagship run dir, at both product
geometries:

  x2 540p->1080p  (bench headline geometry)
  x4 270p->1080p  (the reference's demo geometry,
                   example_frame_test.ipynb cells 2-10)

Frames are real imagery (the committed demo artifact, rolled per-frame
so JPEG decode does real work). Reported fps is the CLI's own number
(upscale_clip_stream: first superbatch = compile/warmup, excluded).
"""

import json
import os
import sys
import tempfile

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 384  # 1 warmup superbatch (16x8) + 2 timed


def log(*a):
    print(*a, flush=True)


def make_frames(directory, hw, n=N_FRAMES):
    os.makedirs(directory, exist_ok=True)
    base = Image.open(os.path.join(REPO, "docs/demo/input_480x270.png")
                      ).convert("RGB").resize((hw[1], hw[0]), Image.BICUBIC)
    arr = np.asarray(base, np.uint8)
    for i in range(n):
        fr = np.roll(arr, shift=3 * i, axis=1)
        Image.fromarray(fr).save(os.path.join(directory, f"im_{i:05d}.jpg"),
                                 quality=90)


def make_run_dir(root, factor):
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
    from video_cycle_gan_upscaling_tpu.utils.config import RunConfig, TrainConfig

    cfg = RunConfig(train=TrainConfig(downscale_factor=factor),
                    output_root=root, subdir="e2e")
    rundir = os.path.join(root, "run")
    os.makedirs(rundir, exist_ok=True)
    cfg.save(os.path.join(rundir, "parameters.json"))

    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=factor,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    ckpt = CheckpointManager(cfg.run_dirs()["models"])
    state = {"params": jax.device_get(params)}
    ckpt.save_best(state)
    ckpt.save(0, state)  # the CLI's default restore is latest-step
    return rundir


def run(factor, with_sink):
    from video_cycle_gan_upscaling_tpu.cli import upscale

    hw = (540, 960) if factor == 2 else (270, 480)
    root = tempfile.mkdtemp(prefix=f"vcgu_e2e_x{factor}_")
    frames_dir = os.path.join(root, "frames")
    make_frames(frames_dir, hw)
    rundir = make_run_dir(root, factor)
    # each geometry's budget-compliant headline mode (bench.py gate)
    mode = "--turbo-tail" if factor == 2 else "--turbo-tail8"
    argv = ["-r", rundir, "-i", frames_dir,
            "--frame-height", str(hw[0]), "--frame-width", str(hw[1]),
            "--tile-height", str(hw[0]), "--tile-width", str(hw[1]),
            "--overlap", "16", mode]
    if with_sink:
        argv += ["-o", os.path.join(root, "out")]
    result = upscale.main(argv)
    tag = "decode+sink" if with_sink else "decode-only"
    log(f"x{factor} {hw[0]}p->{hw[0] * factor}p CLI {mode} "
        f"[{tag}]: {result['fps']:.2f} fps end-to-end "
        f"({result['frames']} frames)")
    return result["fps"]


def run_student(with_sink=False):
    """The round-5 headline through the product surface: --student auto
    (the fastest committed asset whose metadata records a gate-passing
    ship_mode) on a 540p image-dir clip."""
    from video_cycle_gan_upscaling_tpu.cli import upscale

    hw = (540, 960)
    root = tempfile.mkdtemp(prefix="vcgu_e2e_stu_")
    frames_dir = os.path.join(root, "frames")
    make_frames(frames_dir, hw)
    argv = ["--student", "auto", "-i", frames_dir]
    if with_sink:
        argv += ["-o", os.path.join(root, "out")]
    result = upscale.main(argv)
    tag = "decode+sink" if with_sink else "decode-only"
    log(f"x2 540p->1080p CLI --student auto [{tag}]: "
        f"{result['fps']:.2f} fps end-to-end ({result['frames']} frames)")
    return result["fps"]


def main():
    log(f"devices: {jax.devices()}")
    out = {}
    if os.environ.get("VCGU_E2E_STUDENT", "1") == "1":
        out["x2_student_nosink"] = run_student(False)
    if os.environ.get("VCGU_E2E_TURBO", "1") == "1":
        for factor in (2, 4):
            out[f"x{factor}_nosink"] = run(factor, with_sink=False)
            out[f"x{factor}_sink"] = run(factor, with_sink=True)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
