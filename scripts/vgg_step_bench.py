"""VGG-loss train-step time at the reference config (VERDICT r1 item 4).

Reference geometry: train_gan.py defaults — bs=2 (x3 cgc sources = 6 LR
crops/step in the reference; here one fused step at bs=2), 512^2 crops,
resnet-att generator, simple-512 discriminator, vgg-only content loss
(frozen VGG19 block5_conv4 MSE). The extractor uses the documented
seeded-random weights (zero-egress env) — identical FLOPs/step time to
ImageNet weights, so this number stands for the real-weights config.
Also times the plain supervised vgg-only step (compile_training_model
analog, train.py defaults bs=1 at 1080p is RAM-bound in the reference;
we time bs=2 512^2 for comparability).
"""

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
    from video_cycle_gan_upscaling_tpu.losses import (
        make_content_loss,
        wasserstein_pair_losses,
    )
    from video_cycle_gan_upscaling_tpu.models import UpscalerAttention
    from video_cycle_gan_upscaling_tpu.models.discriminators import (
        DiscriminatorSimple512,
    )
    from video_cycle_gan_upscaling_tpu.models.vgg import get_extractor
    from video_cycle_gan_upscaling_tpu.train import create_gan_state, make_gan_step

    log(f"devices: {jax.devices()}")
    vgg = get_extractor(dtype=jnp.bfloat16)
    log(f"vgg weights source: {vgg.source}")
    content = make_content_loss("vgg-only", vgg=vgg)

    gen = UpscalerAttention(kernel_size=5, filters=64, upscale_factor=4,
                            res_block_num=16, dtype=jnp.bfloat16,
                            head_block=4)  # trainers' S-blocked head
    disc = DiscriminatorSimple512(activation="log", dtype=jnp.bfloat16)
    bs = 2
    lr = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (bs, 128, 128, 3)),
                     jnp.float32)
    hr = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (bs, 512, 512, 3)),
                     jnp.float32)
    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
    step = make_gan_step(wasserstein_pair_losses(), content,
                         adversarial_loss_weight=1e-10)
    t0 = time.perf_counter()
    state, m = step(state, lr, hr)
    float(m["loss_gan_total"])
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
    ms = (time.perf_counter() - t0) / n * 1e3
    log(f"RESULT vgg-only GAN step (resnet-att + simple-512, bs=2, 512^2): "
        f"{ms:.1f} ms/step (~29 ms RPC incl)")


if __name__ == "__main__":
    main()
