"""A/B the T1 int8 tail against T2: x-pair-packed up conv (full K lanes).

T1 (current, models/fast_infer.py:_tail_int8): r=1 phase up conv
[3,3,64,1024] — only 64 of 128 MXU K-lanes per tap — then int8 s2d(2) and
the (r=2, extra=2) final conv [3,3,4096,48].

T2: pack W-pairs of the input into channels (free row-major reshape
64 -> 128 lanes), and prepack the up conv with an s_x=2 axis blocking
(rearrange_same_kernel_axes(wp, 1, 2)): kernel [3,nx,128,2048] — full
K-lanes at 1.33x the FLOPs. The output IS already x-blocked, so only a
y-axis s2d remains, and the final conv is the same [3,3,4096,48] kernel
with the (ey, bx, a, b) -> canonical (A=2ey+a, B=2bx+b) input-channel
permutation folded in at prepack. Same linear map as T1; different
evaluation order.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import os

TINY = bool(os.environ.get("VCGU_AB_TINY"))
if TINY:  # CPU correctness run: tiny geometry, interpreted Pallas kernels
    jax.config.update("jax_platforms", "cpu")
    FRAME_HW = (16, 24)
    BLOCKS, FILTERS, BATCH = 2, 8, 2
else:
    FRAME_HW = (540, 960)
    BLOCKS, FILTERS, BATCH = 16, 64, 8
FACTOR = 2


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, rounds=8):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(fn(*args))
    return (time.perf_counter() - t0) / rounds * 1e3


def s2d_y(x, s=2):
    n, h, w_, c = x.shape
    x = x.reshape(n, h // s, s, w_, c).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, h // s, w_, s * c)


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    log(f"devices: {jax.devices()}")
    if TINY:
        from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pn
        pn.INTERPRET = True
    model = UpscalerOrig(kernel_size=5, filters=FILTERS, upscale_factor=FACTOR,
                         res_block_num=BLOCKS,
                         dtype=jnp.float32 if TINY else jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *FRAME_HW, 3), jnp.float32))
    params32 = variables["params"]

    r = FastOrigRunner(params32, res_block_num=BLOCKS, upscale_factor=FACTOR,
                       tile_hw=FRAME_HW, quant=True,
                       dtype=jnp.float32 if TINY else jnp.bfloat16)
    qp = jax.device_put(r.qp)
    x8 = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BATCH, *FRAME_HW, 3)), jnp.float32))
    qp = jax.jit(r.calibrate)(qp, x8[:1])
    qp = jax.device_put(qp)
    trunk = jax.jit(r.apply_trunk)(qp, jax.jit(r.apply_stem)(qp, x8))

    # ---- T2 prepack (host side) -----------------------------------------
    def q_oc(wk):
        amax = jnp.max(jnp.abs(wk), axis=tuple(range(wk.ndim - 1)),
                       keepdims=True)
        s = 127.0 / jnp.maximum(amax, 1e-8)
        q = jnp.clip(jnp.round(wk * s), -127, 127).astype(jnp.int8)
        return q, (1.0 / s).reshape(-1)

    up = params32["upscale_0"]["conv_transp"]
    c_up = up["kernel"].shape[-1]  # 256
    wp, (q_y, q_x), (n_y, n_x) = sp._rearrange_transpose_kernel(
        up["kernel"].astype(jnp.float32), 2)  # [3,3,64,1024]
    wk2, pads_y2, pads_x2 = sp.rearrange_same_kernel_axes(
        wp, 1, 2, P_y=q_y, P_x=q_x)  # [3,nx,128,2048]
    log(f"T2 up kernel: {wk2.shape}")
    up_q2, up_ws2 = q_oc(wk2)
    pads2 = (pads_y2, pads_x2)

    # final kernel at S=4 with the T2 input-channel permutation folded in
    w9 = params32["final_conv"]["kernel"].astype(jnp.float32)
    wk9, (py_l, py_h), (px_l, px_h) = sp.rearrange_same_kernel_axes(w9, 4, 4)
    j = np.arange(4 * 4 * c_up)
    o = j % c_up
    t = j // c_up  # ey*8 + bx*4 + a*2 + b
    ey, rem = t // 8, t % 8
    bx, rem = rem // 4, rem % 4
    a, b = rem // 2, rem % 2
    canon = ((2 * ey + a) * 4 + (2 * bx + b)) * c_up + o
    wk9_t2 = wk9[:, :, canon, :]
    fin_q2, fin_ws2 = q_oc(wk9_t2)
    pads9 = ((py_l, py_h), (px_l, px_h))

    t2p = jax.device_put({
        "up_q": up_q2, "up_ws": up_ws2, "up_b": up["bias"].astype(jnp.float32),
        "fin_q": fin_q2, "fin_ws": fin_ws2,
        "fin_b": params32["final_conv"]["bias"].astype(jnp.float32),
        "s0": qp["tail_s0"], "s1": qp["tail_s1"],
    })

    def tail_t2(p, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters)
        n2, h2, w2, c2 = y.shape
        y = y.reshape(n2, h2, w2 // 2, 2 * c2)  # free W-pair pack
        q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * p["s0"]), -127, 127
                      ).astype(jnp.int8)
        acc = lax.conv_general_dilated(q0, p["up_q"], (1, 1), pads2,
                                       dimension_numbers=sp.CONV_DIMS,
                                       preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * (p["up_ws"] / p["s0"])
        y1 = y1 + jnp.tile(p["up_b"], 8).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        q1 = jnp.clip(jnp.round(y1 * p["s1"]), -127, 127).astype(jnp.int8)
        q1 = s2d_y(q1, 2)  # [n,270,480,4096] int8
        acc2 = lax.conv_general_dilated(q1, p["fin_q"], (1, 1), pads9,
                                        dimension_numbers=sp.CONV_DIMS,
                                        preferred_element_type=jnp.int32)
        yp = acc2.astype(jnp.float32) * (p["fin_ws"] / p["s1"])
        yp = yp + jnp.tile(p["fin_b"], 16).astype(jnp.float32)
        return sp.depth_to_space(jnp.tanh(yp), 4)

    fetch = lambda f: (lambda q, v: jnp.sum(f(q, v).astype(jnp.float32)))

    ms1 = timeit(jax.jit(fetch(r.apply_tail)), qp, trunk)
    log(f"T1 tail (integrated): {ms1:7.1f} ms/batch  ({(ms1 - 29) / BATCH:5.2f} ms/f)")
    ms2 = timeit(jax.jit(fetch(tail_t2)), t2p, trunk)
    log(f"T2 tail (x-packed)  : {ms2:7.1f} ms/batch  ({(ms2 - 29) / BATCH:5.2f} ms/f)")

    # T2 sub-piece: up conv + requant only
    def t2_up(p, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters)
        n2, h2, w2, c2 = y.shape
        y = y.reshape(n2, h2, w2 // 2, 2 * c2)
        q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * p["s0"]), -127, 127
                      ).astype(jnp.int8)
        acc = lax.conv_general_dilated(q0, p["up_q"], (1, 1), pads2,
                                       dimension_numbers=sp.CONV_DIMS,
                                       preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * (p["up_ws"] / p["s0"])
        y1 = y1 + jnp.tile(p["up_b"], 8).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        return jnp.clip(jnp.round(y1 * p["s1"]), -127, 127).astype(jnp.int8)

    ms_up = timeit(jax.jit(fetch(t2_up)), t2p, trunk)
    log(f"T2 up+quant         : {ms_up:7.1f} ms/batch ({(ms_up - 29) / BATCH:5.2f} ms/f)")

    # quality
    out1 = np.asarray(jax.jit(r.apply_tail)(qp, trunk[:1]))
    out2 = np.asarray(jax.jit(tail_t2)(t2p, trunk[:1]))
    mse = float(np.mean((out1 - out2) ** 2))
    log(f"T2 vs T1 PSNR: {10 * np.log10(4.0 / max(mse, 1e-12)):.2f} dB")

    # full-path fps with T2 tail
    def full_t2(packed, x):
        p, q = packed
        return tail_t2(p, r.apply_trunk(q, r.apply_stem(q, x)))

    ms_full = timeit(jax.jit(fetch(full_t2)), (t2p, qp), x8)
    log(f"T2 full b{BATCH}: {ms_full:7.1f} ms/batch = {BATCH / ms_full * 1e3:6.2f} fps")


if __name__ == "__main__":
    main()
