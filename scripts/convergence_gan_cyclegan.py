"""On-chip convergence smokes for the GAN and CycleGAN trainers
(VERDICT r3 item 3: "the difference between 'the step runs' and 'the
trainer works'").

Mirrors the supervised convergence smoke (docs/PERF.md "Training
validation on hardware") for the two adversarial trainers, driving the
REAL CLIs end-to-end on the TPU:

1. paired GAN (cli/train_gan): flagship-family generator at reduced
   depth + simple-512 D, wasserstein adversarial + mse content, a few
   hundred fused steps on real frame crops — reference loop anchor
   /root/reference/upscaling/train_gan.py:296-317;
2. CycleGAN (cli/train_cyclegan): G_A/G_B + D_A/D_B, LSGAN + cycle +
   identity, HBM replay pools, unpaired 128^2 crops from two domains —
   reference-pipeline stage brought in-scope (SURVEY.md §0).

Pass criteria reported per run: every logged loss finite over the whole
run; D and G adversarial losses stay in-band (no collapse to the loss's
degenerate fixed points); cycle/content losses strictly improve
first->last quintile. Sample dumps from the runs are copied to
docs/convergence/ and a summary JSON is written next to them.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REF = "/root/reference/example_movie_frames"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, ".data_convergence2")
OUT = os.path.join(REPO, ".runs_convergence2")
DOCDIR = os.path.join(REPO, "docs", "convergence")
GAN_STEPS = int(os.environ.get("VCGU_GAN_STEPS", "601"))
CYC_STEPS = int(os.environ.get("VCGU_CYC_STEPS", "401"))


def log(*a):
    print(*a, flush=True)


def build_dataset():
    """Two real-content domains from offline sources: 'ukiyo-e' = the
    reference's stored ukiyo-styled demo outputs; 'photo' = the committed
    demo artifacts (bicubic/model 1080p frames). Flips/rotations for
    variety; LANCZOS LR variants for the paired-GAN trainer
    (data.py:15-43 parity)."""
    dirs = {k: os.path.join(ROOT, "images", k) for k in
            ("ukiyo-e_fullhd", "ukiyo-e_1gen", "ukiyo-e_2gen",
             "photo_fullhd")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def variants(im):
        return [im, im.transpose(Image.FLIP_LEFT_RIGHT),
                im.transpose(Image.FLIP_TOP_BOTTOM),
                im.transpose(Image.ROTATE_180)]

    uk = []
    for p in ("ukiyo_upscaled_orig_vgg-mse_best.jpg",
              "ukiyo_upscaled_skip-con_vgg-mae_030000b.jpg"):
        uk += variants(Image.open(os.path.join(REF, p)).convert("RGB"))
    ph = []
    for p in ("bicubic_1080p.png", "model_1080p.png"):
        ph += variants(Image.open(os.path.join(
            REPO, "docs", "demo", p)).convert("RGB"))
    for i, im in enumerate(uk):
        im.save(os.path.join(dirs["ukiyo-e_fullhd"], f"im_{i:03d}.jpg"),
                quality=95)
        lr = im.resize((im.width // 4, im.height // 4), Image.LANCZOS)
        lr.save(os.path.join(dirs["ukiyo-e_1gen"], f"im_{i:03d}.jpg"),
                quality=95)
        lr.save(os.path.join(dirs["ukiyo-e_2gen"], f"im_{i:03d}.jpg"),
                quality=95)
    for i, im in enumerate(ph):
        im.save(os.path.join(dirs["photo_fullhd"], f"im_{i:03d}.jpg"),
                quality=95)
    log(f"dataset: {len(uk)} ukiyo frames (+LR), {len(ph)} photo frames")


def loss_table(lossdir, prefix):
    path = os.path.join(lossdir, f"losses_upscaler_{prefix}.txt")
    rows = open(path).read().strip().split("\n")
    header = rows[0].split("\t")
    data = np.array([[float(v) for v in r.split("\t")] for r in rows[1:]])
    return header, data


def summarize(header, data, name, adv_cols, improve_cols):
    n = len(data)
    q = max(n // 5, 1)
    res = {"steps": n, "all_finite": bool(np.isfinite(data).all())}
    for col in header[1:]:
        c = data[:, header.index(col)]
        res[col] = {"first_q": float(c[:q].mean()),
                    "last_q": float(c[-q:].mean()),
                    "finite": bool(np.isfinite(c).all())}
    res["adv_in_band"] = all(
        np.isfinite(data[:, header.index(c)]).all()
        and float(np.abs(data[-q:, header.index(c)]).mean()) < 100.0
        for c in adv_cols if c in header)
    res["content_improves"] = all(
        res[c]["last_q"] < res[c]["first_q"]
        for c in improve_cols if c in header)
    log(f"{name}: finite={res['all_finite']} adv_in_band="
        f"{res['adv_in_band']} content_improves={res['content_improves']}")
    for col in header[1:]:
        log(f"  {col}: {res[col]['first_q']:.4f} -> {res[col]['last_q']:.4f}")
    return res


def copy_samples(imgdir, tag, n=4):
    os.makedirs(DOCDIR, exist_ok=True)
    copied = []
    if os.path.isdir(imgdir):
        files = sorted(os.listdir(imgdir))
        # latest dump set: prefer the highest-step files
        for f in files[-n:]:
            dst = os.path.join(DOCDIR, f"{tag}_{f}")
            shutil.copyfile(os.path.join(imgdir, f), dst)
            copied.append(os.path.basename(dst))
    log(f"{tag}: copied samples {copied}")
    return copied


def run_gan():
    from video_cycle_gan_upscaling_tpu.cli import train_gan

    argv = [
        "--images-root", os.path.join(ROOT, "images"),
        "--output-root", OUT,
        "-cl", "mse", "-dl", "wasserstein", "-dlw", "1e-5",
        "-m", "orig", "-dm", "simple-512", "-da", "log",
        "--res-blocks", "8", "--filters", "64", "-ks", "5",
        "-bs", "4", "-oh", "256", "-ow", "256", "-nb", str(GAN_STEPS),
        "-msf", "200", "-ic", "8", "-tr", "0.75", "--dtype", "bfloat16",
    ]
    t0 = time.perf_counter()
    train_gan.main(argv)
    wall = time.perf_counter() - t0
    prefix = "gan_orig_mse_simple-512_wasserstein_log-sigm_x4"
    lossdir = os.path.join(OUT, "losses", "ukiyo", prefix)
    header, data = loss_table(lossdir, prefix)
    res = summarize(header, data, "GAN", ("loss_disc", "loss_gan_disc"),
                    ("loss_gan_gen",))
    res["wall_s"] = wall
    res["samples"] = copy_samples(
        os.path.join(OUT, "example_images", "ukiyo", prefix), "gan")
    return res


def run_cyclegan():
    from video_cycle_gan_upscaling_tpu.cli import train_cyclegan

    argv = [
        "--images-root", os.path.join(ROOT, "images"),
        "--output-root", OUT,
        "-i", "photo_fullhd", "-ib", "ukiyo-e_fullhd",
        "-bs", "2", "-oh", "128", "-ow", "128", "-nb", str(CYC_STEPS),
        "-msf", "200", "-ic", "8", "--res-blocks", "6", "--filters", "32",
        "--dtype", "bfloat16", "-tr", "0.75",
    ]
    t0 = time.perf_counter()
    train_cyclegan.main(argv)
    wall = time.perf_counter() - t0
    prefix = sub = None
    for s in sorted(os.listdir(os.path.join(OUT, "losses"))):
        for d in sorted(os.listdir(os.path.join(OUT, "losses", s))):
            if d.startswith("cyclegan"):
                sub, prefix = s, d
    lossdir = os.path.join(OUT, "losses", sub, prefix)
    header, data = loss_table(lossdir, prefix)
    res = summarize(header, data, "CycleGAN",
                    ("loss_d_a", "loss_d_b", "loss_g_adv"),
                    ("loss_cycle",))
    res["wall_s"] = wall
    res["samples"] = copy_samples(
        os.path.join(OUT, "example_images", sub, prefix), "cyclegan")
    return res


def main():
    log(f"devices: {jax.devices()}")
    build_dataset()
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    results = {"gan": run_gan(), "cyclegan": run_cyclegan()}
    os.makedirs(DOCDIR, exist_ok=True)
    with open(os.path.join(DOCDIR, "summary.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    ok = all(r["all_finite"] and r["adv_in_band"] and r["content_improves"]
             for r in results.values())
    log(f"convergence smokes {'PASS' if ok else 'CHECK'} -> "
        f"{DOCDIR}/summary.json")


if __name__ == "__main__":
    main()
