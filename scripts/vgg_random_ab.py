"""Random-VGG vs pixel-MSE convergence A/B (VERDICT r3 item 7b).

The reference's default content loss is frozen ImageNet-VGG19 feature MSE
(/root/reference/upscaling/upscaler/model.py:101-117). Zero egress means
every run here uses the documented seeded-random VGG fallback
(models/vgg.py) — this A/B turns that documentation into measured
evidence: train the same small supervised SR model under (a) pixel mse,
(b) random-VGG vgg-only, (c) random-VGG vgg-mse, same data/steps/seeds,
and report held-out pixel PSNR progression. The claim under test is that
random-VGG features are a *valid training signal* (a fixed random
projection of local image statistics — loss decreases and PSNR improves),
not that they equal ImageNet features in perceptual quality.

Data: aligned HR/LR crops from the committed demo artifacts (real frame
content, LANCZOS downscale — data.py:15-43 parity). Runs on the TPU.
"""

import argparse
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


def build_crops(hr_size=128, factor=4, n=96, seed=0):
    """Aligned (lr, hr) crop arrays from the demo frames, LANCZOS LR."""
    from PIL import Image

    srcs = [Image.open(os.path.join(DEMO, p)).convert("RGB")
            for p in ("bicubic_1080p.png", "model_1080p.png",
                      "input_480x270.png")]
    rng = np.random.default_rng(seed)
    hrs, lrs = [], []
    for i in range(n):
        img = srcs[i % len(srcs)]
        W, H = img.size
        if W < hr_size or H < hr_size:
            img = img.resize((max(W, hr_size), max(H, hr_size)),
                             Image.LANCZOS)
            W, H = img.size
        x0 = int(rng.integers(0, W - hr_size + 1))
        y0 = int(rng.integers(0, H - hr_size + 1))
        hr = img.crop((x0, y0, x0 + hr_size, y0 + hr_size))
        lr = hr.resize((hr_size // factor, hr_size // factor), Image.LANCZOS)
        hrs.append(np.asarray(hr, np.float32) / 127.5 - 1)
        lrs.append(np.asarray(lr, np.float32) / 127.5 - 1)
    return np.stack(lrs), np.stack(hrs)


def run_one(kind, lr_tr, hr_tr, lr_te, hr_te, steps, batch, seed=0):
    import optax

    from video_cycle_gan_upscaling_tpu.losses import (
        make_content_loss_per_example,
    )
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.vgg import get_extractor
    from video_cycle_gan_upscaling_tpu.train import (
        create_generator_state,
        make_supervised_step,
    )

    model = UpscalerOrig(kernel_size=5, filters=32, upscale_factor=4,
                         res_block_num=4, dtype=jnp.bfloat16, head_block=4)
    vgg = get_extractor(dtype=jnp.bfloat16) if kind.startswith("vgg") else None
    assert vgg is None or vgg.source == "random"
    loss = make_content_loss_per_example(kind, rate=0.001, vgg=vgg)
    state = create_generator_state(model, jax.random.PRNGKey(seed),
                                   jnp.zeros((1, *lr_tr.shape[1:3], 3)),
                                   tx=optax.adam(1e-4))
    step = make_supervised_step(loss, seed=seed)

    lr_tr_d, hr_tr_d = jax.device_put(lr_tr), jax.device_put(hr_tr)
    lr_te_d, hr_te_d = jax.device_put(lr_te), jax.device_put(hr_te)

    @jax.jit
    def pick(key):
        idx = jax.random.randint(key, (batch,), 0, lr_tr_d.shape[0])
        return lr_tr_d[idx], hr_tr_d[idx]

    @jax.jit
    def test_psnr(params):
        pred = model.apply({"params": params}, lr_te_d)
        mse = jnp.mean((pred.astype(jnp.float32)
                        - hr_te_d.astype(jnp.float32)) ** 2,
                       axis=(1, 2, 3))
        return jnp.mean(10 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12)))

    hist = []
    t0 = time.perf_counter()
    for i in range(steps):
        lrb, hrb = pick(jax.random.fold_in(jax.random.PRNGKey(7), i))
        state, m = step(state, lrb, hrb)
        if (i + 1) % (steps // 6) == 0:
            p = float(test_psnr(state.params))
            hist.append((i + 1, float(m["loss"]), p))
            log(f"  {kind:8s} step {i + 1:4d}: loss {float(m['loss']):.3e} "
                f" held-out PSNR {p:.2f} dB")
    dt = time.perf_counter() - t0
    return hist, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    log(f"devices: {jax.devices()}")

    lr, hr = build_crops()
    n_te = 16
    lr_tr, hr_tr = lr[:-n_te], hr[:-n_te]
    lr_te, hr_te = lr[-n_te:], hr[-n_te:]
    log(f"train {lr_tr.shape[0]} crops, test {n_te}")

    results = {}
    for kind in ("mse", "vgg-only", "vgg-mse"):
        log(f"-- {kind} --")
        hist, dt = run_one(kind, lr_tr, hr_tr, lr_te, hr_te,
                           args.steps, args.batch)
        results[kind] = hist
        log(f"  done in {dt:.0f}s")

    log("\n| loss | " + " | ".join(f"step {s}" for s, _, _ in
                                   results["mse"]) + " |")
    log("|---|" + "---|" * len(results["mse"]))
    for kind, hist in results.items():
        log(f"| {kind} | " + " | ".join(f"{p:.2f}" for _, _, p in hist)
            + " |")
    log("\n(held-out pixel PSNR dB; random-VGG validity = monotone "
        "improvement, mse expected to win on pixel PSNR by construction)")


if __name__ == "__main__":
    main()
