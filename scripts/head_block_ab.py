"""A/B: GAN train step (bench config, bs=8, 256²) with the S-blocked
training head (UpscalerOrig head_block) vs the plain 3-lane pixel head.
The round-3 device trace attributed 22 of the step's 52 ms device time
to the 3-output-lane head region (fwd+loss fusion 14.3 ms at 0.8% MFU);
blocking lifts the lanes to 3*S^2. Values/grads equivalence:
tests/test_generators.py::test_orig_head_block_equivalent_values_and_grads.
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.losses import (
        pixel_mse, wasserstein_pair_losses)
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator, UpscalerOrig)
    from video_cycle_gan_upscaling_tpu.train import (
        create_gan_state, make_gan_step)

    log(f"devices: {jax.devices()}")
    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    for hb in (1, 4, 8):
        gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                           res_block_num=16, dtype=jnp.bfloat16,
                           head_block=hb)
        disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
        state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
        step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                             adversarial_loss_weight=1e-6)
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, lr, hr)
            float(m["loss_gan_total"])
        ms = (time.perf_counter() - t0) / n * 1e3
        log(f"GAN step bs=8 256^2 head_block={hb}: {ms:.1f} ms "
            f"(incl ~29 ms RPC)")




def trunk_pack_ab():
    """Follow-up A/B: trunk_pack (W-pair-packed trunk) on top of the
    S-blocked head, full GAN step at the bench config."""
    import jax
    import jax.numpy as jnp

    from video_cycle_gan_upscaling_tpu.losses import (
        pixel_mse, wasserstein_pair_losses)
    from video_cycle_gan_upscaling_tpu.models import (
        PatchGanDiscriminator, UpscalerOrig)
    from video_cycle_gan_upscaling_tpu.train import (
        create_gan_state, make_gan_step)

    lr = jnp.zeros((8, 64, 64, 3), jnp.float32)
    hr = jnp.zeros((8, 256, 256, 3), jnp.float32)
    for tp in (False, True):
        gen = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                           res_block_num=16, dtype=jnp.bfloat16,
                           head_block=4, trunk_pack=tp)
        disc = PatchGanDiscriminator(dtype=jnp.bfloat16)
        state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr, hr)
        step = make_gan_step(wasserstein_pair_losses(), pixel_mse,
                             adversarial_loss_weight=1e-6)
        state, m = step(state, lr, hr)
        float(m["loss_gan_total"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, lr, hr)
            float(m["loss_gan_total"])
        ms = (time.perf_counter() - t0) / n * 1e3
        log(f"GAN step bs=8 256^2 head_block=4 trunk_pack={tp}: "
            f"{ms:.1f} ms (incl ~29 ms RPC)")


if __name__ == "__main__":
    import sys

    if "--trunk-pack" in sys.argv:
        import jax as _j

        log(f"devices: {_j.devices()}")
        trunk_pack_ab()
    else:
        main()
