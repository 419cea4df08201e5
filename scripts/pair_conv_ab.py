"""Direct A/B: pair_conv_fused vs the XLA int8 chain at the two
stage-1 geometries (x2: [8,540,480,128]->2048; x4 mid: [8,540,480,512]
->2048) and the x4 stage-0 ([8,270,240,128]->2048). Prints the Pallas
block pick so fallbacks are visible."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
from video_cycle_gan_upscaling_tpu.ops.pallas import pair_conv

RPC_MS = 29.0
BATCH = 8


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, rounds=8, flops=None):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / BATCH
    extra = f"  (ideal {flops / 394e9:.2f} ms/f int8)" if flops else ""
    log(f"{name:46s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f{extra}")
    return per_f


def run(tag, h, w2, k2, co, ny=3, nx=2, out_int8=False):
    log(f"--- {tag}: x[{BATCH},{h},{w2},{k2}] w[{ny},{nx},{k2},{co}] "
        f"out_int8={out_int8} ---")
    th = pair_conv._pick_th(h, w2, k2, co, ny, quant=True,
                            out_int8=out_int8)
    log(f"pallas block rows th = {th}")
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, h, w2, k2), jnp.bfloat16, -1, 1))(key)
    rng = np.random.default_rng(0)
    w_q = jnp.asarray(rng.integers(-127, 128, (ny, nx, k2, co)), jnp.int8)
    ws = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (co,)), jnp.float32)
    s_in = jnp.asarray(rng.uniform(60, 120, (k2,)), jnp.float32)
    s_out = jnp.asarray(rng.uniform(60, 120, (co,)), jnp.float32) \
        if out_int8 else None
    pads = ((1, 1), (0, 1))
    flops = 2 * h * w2 * ny * nx * k2 * co

    def xla_chain(x):
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * s_in), -127, 127
                     ).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            q, w_q, (1, 1), pads, dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ws + b
        y = jnp.where(y < 0.0, 0.2 * y, y)
        if out_int8:
            return jnp.clip(jnp.round(y * s_out), -127, 127
                            ).astype(jnp.int8)
        return y.astype(jnp.bfloat16)

    def fused(x):
        return pair_conv.pair_conv_fused(
            x, w_q, pads=pads, w_scales=ws, bias=b, in_scales=s_in,
            out_scales=s_out)

    timeit("XLA chain (requant+conv+epilogue)", xla_chain, x, flops=flops)
    timeit("pair_conv_fused (Pallas)", fused, x, flops=flops)


def main():
    log(f"devices: {jax.devices()}")
    run("x4 stage-1 (mid 256ch)", 540, 480, 512, 2048)
    run("x4 stage-1 all-int8 out", 540, 480, 512, 2048, out_int8=True)
    run("x2 stage-1 (trunk 64ch)", 540, 480, 128, 2048)
    run("x4 stage-0 (LR 64ch)", 270, 240, 128, 2048)


if __name__ == "__main__":
    main()
