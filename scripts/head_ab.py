"""A/B the int8 tail HEAD conv formulations on the flagship geometry.

(a) former path: y-fold s2d (relayout) + XLA S=4 conv [3,3,4096,48] +
    dequant/bias/tanh + d2s(4).
(d) shipped path (ops/head_conv.py): stride-(2,2) conv with the
    [6,4,2048,96] S=(4,8) kernel straight on the up conv's layout — no
    relayout, 96 of 128 output lanes.

Measured (v5e, b8, per-frame minus ~29 ms RPC): (a) 10.51 ms/f,
x-fold + stride-(2,1) S=(4,8) variant 7.92 ms/f, (d) 5.67 ms/f; a
Pallas carry-based S=(4,8) kernel was slower than (a) end-to-end
(serialized row carry; see docs/PERF.md). Parity (a)-(d): bit-exact.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BATCH = 8
C_UP = 256


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.ops import head_conv as hc
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    # generate on-device: a 4.25 GB host->device transfer stalls the tunnel
    q1 = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, 540, 480, 8 * C_UP), -127, 128, jnp.int32
    ).astype(jnp.int8))(jax.random.PRNGKey(0))
    w9 = jnp.asarray(rng.normal(size=(9, 9, C_UP, 3)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    s1 = jnp.float32(0.37)

    def q_oc(wk):
        amax = jnp.max(jnp.abs(wk), axis=tuple(range(wk.ndim - 1)),
                       keepdims=True)
        s = 127.0 / jnp.maximum(amax, 1e-8)
        return (jnp.clip(jnp.round(wk * s), -127, 127).astype(jnp.int8),
                (1.0 / s).reshape(-1))

    # (a) S=4 square kernel with the x-packed-layout permutation folded in
    wk9, (py_l, py_h), (px_l, px_h) = sp.rearrange_same_kernel_axes(w9, 4, 4)
    j = np.arange(16 * C_UP)
    o, t = j % C_UP, j // C_UP
    ey, rem = t // 8, t % 8
    bx, rem = rem // 4, rem % 4
    a, b = rem // 2, rem % 2
    canon = ((2 * ey + a) * 4 + (2 * bx + b)) * C_UP + o
    wa_q, wa_ws = q_oc(wk9[:, :, canon, :])
    pads_a = ((py_l, py_h), (px_l, px_h))

    def head_a(q):
        qf = sp.space_to_depth_axes(q, 2, 1)
        acc = lax.conv_general_dilated(qf, wa_q, (1, 1), pads_a,
                                       dimension_numbers=sp.CONV_DIMS,
                                       preferred_element_type=jnp.int32)
        yp = acc.astype(jnp.float32) * (wa_ws / s1)
        yp = jnp.tanh(yp + jnp.tile(bias, 16))
        return sp.depth_to_space(yp, 4)

    # (d) shipped: stride-(2,2) S=(4,8) head conv
    wd, px_d = hc.prepack_head_s48(w9, C_UP)
    wd_q, wd_ws = q_oc(wd)

    def head_d(q):
        yp = hc.head_conv_s48(q, wd_q, wd_ws / s1, jnp.tile(bias, 32), px_d)
        return sp.depth_to_space_axes(yp, 4, 8)

    def probe(f):
        return jax.jit(lambda q: (jnp.sum(f(q).astype(jnp.float32)),
                                  f(q)[0, :4, :4, :].astype(jnp.float32)))

    def run(tag, f, rounds=8):
        p = probe(f)
        t0 = time.perf_counter()
        _, sl = p(q1)
        sl = np.asarray(sl)
        log(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(rounds):
            float(p(q1)[0])
        ms = (time.perf_counter() - t0) / rounds * 1e3
        log(f"{tag}: {ms:7.1f} ms/b ({(ms - 29) / BATCH:5.2f} ms/f)")
        return sl

    sl_d = run("(d) stride-(2,2) direct ", head_d)
    sl_a = run("(a) s2d + S=4 conv      ", head_a)
    log(f"parity a-vs-d max err: {np.abs(sl_a - sl_d).max():.3e}")


if __name__ == "__main__":
    main()
