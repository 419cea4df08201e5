"""On-hardware adversarial convergence run + demo-frame parity artifact
(VERDICT r1 items 6 and 7).

1. Builds a small real-image dataset from the reference's stored 1080p
   demo frames (/root/reference/example_movie_frames/*.jpg — the only
   real image data available offline), with LANCZOS 480x270 LR variants
   standing in for the CycleGAN gen1/gen2 outputs.
2. Runs the REAL train_gan CLI on the TPU: flagship orig generator +
   simple-512 discriminator, wasserstein + mse content, bf16, 256^2
   crops — a multi-thousand-step adversarial run through the fused
   jitted GAN step.
3. Demo artifact: reproduces example_frame_test.ipynb cells 2-10 —
   crop BtoA_00286.jpg to (0,0,480,270), bicubic and model x4 outputs at
   1920x1080 — and records PSNR/SSIM against the reference's stored
   bicubic baseline (ukiyo_lowres.jpg) and model outputs. Artifacts +
   a small golden pair are written to docs/demo/.
"""

import json
import os
import shutil
import sys
import time

import numpy as np
from PIL import Image

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REF = "/root/reference/example_movie_frames"
ROOT = "/root/repo/.data_convergence"
OUT = "/root/repo/.runs_convergence"
DEMO = "/root/repo/docs/demo"
STEPS = int(os.environ.get("VCGU_CONV_STEPS", "3001"))


def log(*a):
    print(*a, flush=True)


def build_dataset():
    hr_dir = os.path.join(ROOT, "images", "ukiyo-e_fullhd")
    g1_dir = os.path.join(ROOT, "images", "ukiyo-e_1gen")
    g2_dir = os.path.join(ROOT, "images", "ukiyo-e_2gen")
    for d in (hr_dir, g1_dir, g2_dir):
        os.makedirs(d, exist_ok=True)
    sources = [
        Image.open(f"{REF}/ukiyo_upscaled_orig_vgg-mse_best.jpg").convert("RGB"),
        Image.open(f"{REF}/ukiyo_upscaled_skip-con_vgg-mae_030000b.jpg").convert("RGB"),
    ]
    variants = []
    for im in sources:
        variants += [im, im.transpose(Image.FLIP_LEFT_RIGHT),
                     im.transpose(Image.FLIP_TOP_BOTTOM),
                     im.transpose(Image.ROTATE_180)]
    for i, im in enumerate(variants):
        name = f"frame_{i:03d}.jpg"
        im.save(os.path.join(hr_dir, name), quality=97)
        lr = im.resize((480, 270), Image.LANCZOS)
        lr.save(os.path.join(g1_dir, name), quality=97)
        lr2 = im.resize((960, 540), Image.LANCZOS).resize((480, 270),
                                                          Image.LANCZOS)
        lr2.save(os.path.join(g2_dir, name), quality=97)
    log(f"dataset: {len(variants)} HR frames at {hr_dir}")


def train():
    from video_cycle_gan_upscaling_tpu.cli import train_gan

    argv = [
        "--images-root", os.path.join(ROOT, "images"),
        "--output-root", OUT,
        "-cl", "mse", "-dl", "wasserstein", "-dlw", "1e-5",
        "-m", "orig", "-dm", "simple-512", "-da", "log",
        "--res-blocks", "16", "--filters", "64", "-ks", "5",
        "-bs", "4", "-oh", "256", "-ow", "256", "-nb", str(STEPS),
        "-msf", "500", "-ic", "8", "-tr", "0.75",
        "--dtype", "bfloat16",
    ]
    t0 = time.perf_counter()
    train_gan.main(argv)
    log(f"training wall time: {time.perf_counter() - t0:.0f}s for {STEPS} steps")


def summarize_losses(lossdir, prefix):
    path = os.path.join(lossdir, f"losses_upscaler_{prefix}.txt")
    rows = open(path).read().strip().split("\n")
    header = rows[0].split("\t")
    data = np.array([[float(v) for v in r.split("\t")] for r in rows[1:]])
    log(f"loss log: {len(data)} rows, columns {header}")
    for name in ("loss_disc", "loss_gan_gen", "loss_gan_total"):
        if name in header:
            c = data[:, header.index(name)]
            n = len(c)
            log(f"  {name}: first10 {c[:10].mean():.4f}  "
                f"mid {c[n // 2 - 5:n // 2 + 5].mean():.4f}  "
                f"last10 {c[-10:].mean():.4f}  finite={np.isfinite(c).all()}")
    return data, header


def psnr(a, b, peak=255.0):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def demo(run_dir, best=True):
    import jax.numpy as jnp

    from video_cycle_gan_upscaling_tpu.cli.evaluate import _load_model

    class A:
        pass

    args = A()
    args.run_dir = run_dir
    args.checkpoint_dir = None
    args.best = best
    args.step = None
    cfg, model, params = _load_model(args)

    from video_cycle_gan_upscaling_tpu.ops.codec import image_to_array
    from video_cycle_gan_upscaling_tpu.video.metrics import psnr as jpsnr
    from video_cycle_gan_upscaling_tpu.video.metrics import ssim as jssim

    os.makedirs(DEMO, exist_ok=True)
    src = Image.open(f"{REF}/BtoA_00286.jpg").convert("RGB")
    crop = src.crop((0, 0, 480, 270))  # example_frame_test.ipynb cell 2
    crop.save(os.path.join(DEMO, "input_480x270.png"))
    x = image_to_array(crop)[None]  # [1,270,480,3] in [-1,1]

    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))
    y = np.asarray(fwd(params, jnp.asarray(x))[0], np.float32)
    out8 = np.uint8(np.round(np.clip((y + 1) * 127.5, 0, 255)))
    Image.fromarray(out8).save(os.path.join(DEMO, "model_1080p.png"))

    bicubic = crop.resize((1920, 1080), Image.BICUBIC)
    bicubic.save(os.path.join(DEMO, "bicubic_1080p.png"))

    ref_bicubic = np.asarray(Image.open(f"{REF}/ukiyo_lowres.jpg"))
    ref_orig = np.asarray(Image.open(
        f"{REF}/ukiyo_upscaled_orig_vgg-mse_best.jpg"))
    ref_skip = np.asarray(Image.open(
        f"{REF}/ukiyo_upscaled_skip-con_vgg-mae_030000b.jpg"))
    ours_b = np.asarray(bicubic)

    metrics = {
        "geometry": "BtoA_00286.jpg crop (0,0,480,270) -> x4 -> 1920x1080",
        "psnr_our_bicubic_vs_ref_stored_bicubic": psnr(ours_b, ref_bicubic),
        "psnr_model_vs_bicubic": psnr(out8, ours_b),
        "psnr_model_vs_ref_orig_output": psnr(out8, ref_orig),
        "psnr_model_vs_ref_skipcon_output": psnr(out8, ref_skip),
        "psnr_ref_orig_vs_bicubic": psnr(ref_orig, ref_bicubic),
        "steps": STEPS,
    }
    # SSIM on [-1,1] arrays via the framework metric
    a = jnp.asarray(out8, jnp.float32) / 127.5 - 1
    b = jnp.asarray(ours_b, jnp.float32) / 127.5 - 1
    metrics["ssim_model_vs_bicubic"] = float(
        np.asarray(jssim(a[None], b[None])).reshape(-1)[0])
    with open(os.path.join(DEMO, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    log("demo metrics: " + json.dumps(metrics, indent=2))

    # small golden pair for the CPU test suite (96x128 input crop)
    gx = x[:, :96, :128]
    gy = np.asarray(fwd(params, jnp.asarray(gx))[0], np.float32)
    g8 = np.uint8(np.round(np.clip((gy + 1) * 127.5, 0, 255)))
    Image.fromarray(np.uint8(np.round((gx[0] + 1) * 127.5))).save(
        os.path.join(DEMO, "golden_input_96x128.png"))
    Image.fromarray(g8).save(os.path.join(DEMO, "golden_output_384x512.png"))

    # export the generator checkpoint for the golden test / demo replay
    from flax import serialization

    with open(os.path.join(DEMO, "generator_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, params)))
    with open(os.path.join(DEMO, "model_config.json"), "w") as f:
        json.dump({"generator": "orig", "kernel_size": 5, "filters": 64,
                   "res_block_num": 16, "norm": "instance",
                   "upscale_factor": 4}, f)


def main():
    log(f"devices: {jax.devices()}")
    build_dataset()
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    train()
    prefix = "gan_orig_mse_simple-512_wasserstein_log-sigm_x4"
    lossdir = os.path.join(OUT, "losses", "ukiyo", prefix)
    summarize_losses(lossdir, prefix)
    demo(lossdir)


if __name__ == "__main__":
    main()
