"""A/B stride-free reformulations of the x2 int8 HEAD conv.

Motivation (docs/PERF.md round-3 device trace): at x2 the shipped
stride-(2,2) S=(4,8) head (head_conv.py) runs ~3.75 ms/f in-graph vs a
~2.07 ms/f padded-form roofline (~55%), while the STRIDE-1 int8 convs
in the same graph (stage-1 phase convs at x4) execute at 88% MFU. Both
strides can be removed without new FLOPs:

- W stride 2 folds into lanes for FREE (W-pairs are lane-adjacent in
  the x-packed layout): [540,480,2048] -> [540,240,4096], kernel cols
  4 -> 2.
- H stride 2 splits the conv by row PARITY into two stride-1 convs on
  the even/odd rows (the head is linear): q1[0::2] / q1[1::2], kernel
  rows 6 -> 3 each. The strided row slice costs a copy here, but the
  stage-1 Pallas pair kernel could EMIT the two parity streams
  natively (it writes the same bytes either way).

All int8 kernels are lane/row permutations of the SAME quantized
S=(4,8) kernel, so every form's int32 accumulator is bit-identical by
construction (asserted).

Forms: (A) shipped stride-(2,2) [6,4,2048,96];
(C) fully-folded stride-1 [3,2,8192,96] (needs a row-interleave
    transpose of the 531 MB q1 — measured fused-in);
(D) parity-split stride-1 2x [3,2,4096,96] (row slices measured
    fused-in); (Dp) parity-split on PRE-SPLIT inputs — the
    Pallas-dual-emit scenario's steady-state cost.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import sys

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4  # 8 OOMs form (C)
C_UP = 256
H, W2 = 540, 480  # x2 flagship: 540x960 -> q1 [540, 480, 8*C_UP]


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.ops import head_conv as hc
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    q1 = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, H, W2, 8 * C_UP), -127, 128, jnp.int32
    ).astype(jnp.int8))(jax.random.PRNGKey(0))
    w9 = jnp.asarray(rng.normal(size=(9, 9, C_UP, 3)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
    bias96 = jnp.tile(bias, 32)

    wd, px_d = hc.prepack_head_s48(w9, C_UP)
    amax = jnp.max(jnp.abs(wd), axis=(0, 1, 2), keepdims=True)
    s = 127.0 / jnp.maximum(amax, 1e-8)
    wd_q = np.asarray(jnp.clip(jnp.round(wd * s), -127, 127)
                      ).astype(np.int8)
    ws = np.asarray((1.0 / s).reshape(-1), np.float32)
    pxl, pxh = int(px_d[0]), int(px_d[1])
    log(f"head px pads: ({pxl},{pxh})")
    assert pxl % 2 == 0, pxl
    # folded-W col pads: folded col = ow + vx' - pxl//2, 2 kernel cols,
    # out width W2//2 needs pad sum 1
    pw = (pxl // 2, 1 - pxl // 2)
    c8 = 8 * C_UP

    def epi(acc):
        yp = jnp.tanh(acc.astype(jnp.float32) * ws + bias96)
        return sp.depth_to_space_axes(yp, 4, 8)

    # (A) shipped
    wa = jnp.asarray(wd_q)

    def head_a(q):
        acc = lax.conv_general_dilated(
            q, wa, (2, 2), ((2, 3), (pxl, pxh)),
            dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        return epi(acc)

    # W-folded kernel pieces: wf[j, vx', p*c8 + u] = wd[j, 2vx'+p, u]
    wf = np.zeros((6, 2, 2 * c8, 96), np.int8)
    for vxp in range(2):
        for p in range(2):
            wf[:, vxp, p * c8:(p + 1) * c8] = wd_q[:, 2 * vxp + p]

    # (C) fully folded: wc[iy, vx', ey*2*c8 + (p*c8+u)] = wf[2iy+ey, vx']
    wc = np.zeros((3, 2, 4 * c8, 96), np.int8)
    for ey in range(2):
        wc[:, :, ey * 2 * c8:(ey + 1) * 2 * c8] = wf[np.arange(3) * 2 + ey]
    wc = jnp.asarray(wc)

    def fold_c(q):
        n = q.shape[0]
        x = q.reshape(n, H // 2, 2, W2 // 2, 2, c8)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h2, w4, ey, p, u
        return x.reshape(n, H // 2, W2 // 2, 4 * c8)

    def head_c(q):
        acc = lax.conv_general_dilated(
            fold_c(q), wc, (1, 1), ((1, 1), pw),
            dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        return epi(acc)

    # (D) parity split: ke = wf rows (0,2,4), ko = wf rows (1,3,5)
    ke = jnp.asarray(wf[0::2])
    ko = jnp.asarray(wf[1::2])

    def fold_w(q):
        n, h, _, _ = q.shape
        return q.reshape(n, h, W2 // 2, 2 * c8)  # free

    def head_d_parts(qe, qo):
        acc = lax.conv_general_dilated(
            qe, ke, (1, 1), ((1, 1), pw),
            dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        acc = acc + lax.conv_general_dilated(
            qo, ko, (1, 1), ((1, 1), pw),
            dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        return epi(acc)

    def head_d(q):
        return head_d_parts(fold_w(q[:, 0::2]), fold_w(q[:, 1::2]))

    qe = jax.jit(lambda q: fold_w(q[:, 0::2]))(q1)
    qo = jax.jit(lambda q: fold_w(q[:, 1::2]))(q1)

    def probe(f, *args):
        p = jax.jit(lambda *a: (
            jnp.sum(lax.optimization_barrier(f(*a)).astype(jnp.float32)),
            f(*a)[0, :4, :4, :].astype(jnp.float32)))
        return p, args

    def run(tag, f, *args, rounds=8):
        p, a = probe(f, *args)
        t0 = time.perf_counter()
        _, sl = p(*a)
        sl = np.asarray(sl)
        log(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(rounds):
            float(p(*a)[0])
        ms = (time.perf_counter() - t0) / rounds * 1e3
        log(f"{tag}: {ms:7.1f} ms/b ({(ms - 29) / BATCH:5.2f} ms/f)")
        return sl

    forms = sys.argv[2] if len(sys.argv) > 2 else "acdp"
    sl_a = run("(A) stride-(2,2) shipped      ", head_a, q1)
    if "c" in forms:
        sl_c = run("(C) full fold (incl transpose)", head_c, q1)
        log(f"parity C-vs-A max err: {np.abs(sl_c - sl_a).max():.3e}")
    if "d" in forms:
        sl_d = run("(D) parity split (incl slice) ", head_d, q1)
        log(f"parity D-vs-A max err: {np.abs(sl_d - sl_a).max():.3e}")
    if "p" in forms:
        sl_p = run("(Dp) parity split, pre-split  ", head_d_parts, qe, qo)
        log(f"parity Dp-vs-A max err: {np.abs(sl_p - sl_a).max():.3e}")


if __name__ == "__main__":
    main()
