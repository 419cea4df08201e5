"""Piece breakdown of the fast runner on TPU: stem / trunk / tail, plus
frame-batch scaling — directs the next round of kernel work."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

FRAME_HW = (540, 960)
FACTOR = 2


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, rounds=8):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(fn(*args))
    return (time.perf_counter() - t0) / rounds * 1e3


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *FRAME_HW, 3), jnp.float32))
    params32 = variables["params"]

    for quant in (False, True):
        tag = "int8" if quant else "bf16"
        r = FastOrigRunner(params32, res_block_num=16, upscale_factor=FACTOR,
                           tile_hw=FRAME_HW, quant=quant)
        qp = jax.device_put(r.qp)
        for batch in (4, 8):
            x = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
                -1, 1, (batch, *FRAME_HW, 3)), jnp.float32))
            h0 = jax.jit(r.apply_stem)(qp, x)
            trunk = jax.jit(r.apply_trunk)(qp, h0)
            try:
                stem_ms = timeit(jax.jit(
                    lambda q, v: jnp.sum(r.apply_stem(q, v).astype(jnp.float32))), qp, x)
                trunk_ms = timeit(jax.jit(
                    lambda q, v: jnp.sum(r.apply_trunk(q, v).astype(jnp.float32))), qp, h0)
                tail_ms = timeit(jax.jit(
                    lambda q, v: jnp.sum(r.apply_tail(q, v))), qp, trunk)
                full_ms = timeit(jax.jit(
                    lambda q, v: jnp.sum(r.apply(q, v))), qp, x)
                log(f"{tag} b{batch}: stem {stem_ms:.1f} trunk {trunk_ms:.1f} "
                    f"tail {tail_ms:.1f} full {full_ms:.1f} ms "
                    f"({batch / full_ms * 1e3:.2f} fps) [~29ms RPC incl each]")
            except Exception as e:
                log(f"{tag} b{batch}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
