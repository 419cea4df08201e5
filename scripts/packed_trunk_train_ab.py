"""Scout: W-pair-packed trunk for TRAINING graphs.

The train-step trace puts the 64-channel trunk convs at ~24-30% MFU
(64 of 128 MXU output lanes). Packing W-pairs into channels (free
reshape; kernel rearranged in-graph by the differentiable one-hot
einsum, ops/subpixel.rearrange_same_kernel_axes) doubles the lanes at
1.4x FLOPs — net ~1.4x if XLA reaches similar efficiency at 128 lanes.
This isolates the question on a 16-block conv+IN+PReLU+residual chain,
fwd+bwd at the bench training shape (b8, 64x64, 64ch), BEFORE any
module machinery is built. IN stats in the packed form fold the two
W-slots of each channel (exact; XLA reduce is cheap at crop scale).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

B, H, W, C = 8, 64, 64, 64
K = 5
NBLOCK = 16


def log(*a):
    print(*a, flush=True)


def _params(rng):
    ks = jax.random.split(rng, NBLOCK * 2)
    ws = [jax.random.normal(k, (K, K, C, C), jnp.float32) * 0.05
          for k in ks]
    gs = [jnp.ones((C,), jnp.float32) for _ in range(NBLOCK)]
    bs = [jnp.zeros((C,), jnp.float32) for _ in range(NBLOCK)]
    pr = [jnp.full((C,), 0.25, jnp.float32) for _ in range(NBLOCK)]
    return ws, gs, bs, pr


def _in_prelu(y, g, b, a):
    m = y.mean((1, 2), keepdims=True)
    v = ((y - m) ** 2).mean((1, 2), keepdims=True)
    z = (y - m) * jax.lax.rsqrt(v + 1e-5) * g + b
    return jnp.where(z >= 0, z, a * z)


def chain_canonical(params, x):
    ws, gs, bs, pr = params
    y = x.astype(jnp.bfloat16)
    from jax import lax

    from video_cycle_gan_upscaling_tpu.ops.subpixel import CONV_DIMS

    for i in range(NBLOCK):
        skip = y
        z = lax.conv_general_dilated(
            y, ws[2 * i].astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=CONV_DIMS)
        z = _in_prelu(z.astype(jnp.float32), gs[i], bs[i], pr[i]
                      ).astype(jnp.bfloat16)
        z = lax.conv_general_dilated(
            z, ws[2 * i + 1].astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=CONV_DIMS)
        y = skip + z
    return y.astype(jnp.float32)


def _in_prelu_packed(y, g, b, a):
    # per-channel stats folding the two W-slots: [N,H,W2,2C]
    n, h, w2, c2 = y.shape
    c = c2 // 2
    yy = y.reshape(n, h, w2, 2, c)
    m = yy.mean((1, 2, 3), keepdims=True)
    v = ((yy - m) ** 2).mean((1, 2, 3), keepdims=True)
    z = ((yy - m) * jax.lax.rsqrt(v + 1e-5) * g + b).reshape(y.shape)
    a2 = jnp.tile(a, 2)
    return jnp.where(z >= 0, z, a2 * z)


def chain_packed(params, x):
    ws, gs, bs, pr = params
    from jax import lax

    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    n, h, w, c = x.shape
    y = x.reshape(n, h, w // 2, 2 * c).astype(jnp.bfloat16)
    for i in range(NBLOCK):
        skip = y
        wk0, py0, px0 = sp.rearrange_same_kernel_axes(ws[2 * i], 1, 2)
        z = lax.conv_general_dilated(
            y, wk0.astype(jnp.bfloat16), (1, 1), (py0, px0),
            dimension_numbers=sp.CONV_DIMS)
        z = _in_prelu_packed(z.astype(jnp.float32), gs[i], bs[i], pr[i]
                             ).astype(jnp.bfloat16)
        wk1, py1, px1 = sp.rearrange_same_kernel_axes(ws[2 * i + 1], 1, 2)
        z = lax.conv_general_dilated(
            z, wk1.astype(jnp.bfloat16), (1, 1), (py1, px1),
            dimension_numbers=sp.CONV_DIMS)
        y = skip + z
    return y.reshape(n, h, w, c).astype(jnp.float32)


def main():
    log(f"devices: {jax.devices()}")
    params = _params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (B, H, W, C)),
                    jnp.float32)

    outs = {}
    for name, chain in (("canonical", chain_canonical),
                        ("packed", chain_packed)):
        def loss(ws, chain=chain):
            return jnp.mean(chain((ws, *params[1:]), x) ** 2)

        fwd = jax.jit(lambda ws, chain=chain: jnp.sum(
            chain((ws, *params[1:]), x)))
        vg = jax.jit(lambda ws, loss=loss: jax.value_and_grad(
            lambda w: loss(w))(ws))

        outs[name] = float(fwd(params[0]))
        v, g = vg(params[0])
        jax.block_until_ready(v)
        for tag, fn, arg in (("fwd", fwd, params[0]), ("fwd+bwd", vg,
                                                       params[0])):
            float(jnp.sum(jnp.asarray(outs[name])))  # warm
            t0 = time.perf_counter()
            for _ in range(10):
                r = fn(arg)
                r = r[0] if isinstance(r, tuple) else r
                float(r)
            ms = (time.perf_counter() - t0) / 10 * 1e3
            log(f"{name:10s} {tag:7s}: {ms:7.2f} ms (incl ~29 RPC)")
    # numeric agreement (same linear maps)
    log(f"fwd sums: {outs}")


if __name__ == "__main__":
    main()
