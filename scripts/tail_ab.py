"""A/B the int8 tail against a restructured variant (T1) on TPU.

T0 (current): s2d(2) -> blocked transpose conv [2,2,256,4096] (16x padded
FLOPs: 1.09 TFLOP vs 68 GFLOP true) -> final 3x3x4096->48.
T1: r=1 phase up conv = 1x1 conv 64->1024 (exact FLOPs, pure matmul) ->
int8 space_to_depth -> final conv prepacked with (r=2, extra_block=2)
(the input-side renest folds into the kernel, so the s2d is canonical).

Both produce identical linear maps; only the evaluation order and the
per-out-channel weight-scale grouping differ. Times each stage and the
whole tail; checks T1 vs T0 PSNR.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *FRAME_HW, 3), jnp.float32))
    params32 = variables["params"]

    r = FastOrigRunner(params32, res_block_num=16, upscale_factor=FACTOR,
                       tile_hw=FRAME_HW, quant=True)
    qp = jax.device_put(r.qp)
    x8 = jax.device_put(jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, *FRAME_HW, 3)), jnp.float32))
    qp = jax.jit(r.calibrate)(qp, x8[:1])
    qp = jax.device_put(qp)
    trunk = jax.jit(r.apply_trunk)(qp, jax.jit(r.apply_stem)(qp, x8))

    # ---- T1 prepack (host side) -----------------------------------------
    def q_oc(wk):
        amax = jnp.max(jnp.abs(wk), axis=tuple(range(wk.ndim - 1)),
                       keepdims=True)
        s = 127.0 / jnp.maximum(amax, 1e-8)
        q = jnp.clip(jnp.round(wk * s), -127, 127).astype(jnp.int8)
        return q, (1.0 / s).reshape(-1)

    up = params32["upscale_0"]["conv_transp"]
    wk1, plan1 = sp.prepack_transpose_phase(up["kernel"], 2, 1)  # [1,1,64,1024]
    up_q1, up_ws1 = q_oc(wk1.astype(jnp.float32))
    w9 = params32["final_conv"]["kernel"]
    wk9, plan9 = sp.prepack_same_phase_blocked(w9, 2, 2)  # r=2, extra=2
    fin_q1, fin_ws1 = q_oc(wk9.astype(jnp.float32))
    t1p = jax.device_put({
        "up_q": up_q1, "up_ws": up_ws1, "up_b": up["bias"],
        "fin_q": fin_q1, "fin_ws": fin_ws1, "fin_b": params32["final_conv"]["bias"],
        "s0": qp["tail_s0"], "s1": qp["tail_s1"],
    })
    pads1 = plan1[0]
    pads9 = plan9[0]

    def tail_t1(p, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters).astype(jnp.bfloat16)
        q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * p["s0"]), -127, 127
                      ).astype(jnp.int8)
        acc = lax.conv_general_dilated(q0, p["up_q"], (1, 1), pads1,
                                       dimension_numbers=sp.CONV_DIMS,
                                       preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * (p["up_ws"] / p["s0"])
        y1 = y1 + jnp.tile(p["up_b"], 4).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        q1 = jnp.clip(jnp.round(y1 * p["s1"]), -127, 127).astype(jnp.int8)
        q1 = sp.space_to_depth(q1, 2)  # [n,270,480,4096] int8
        acc2 = lax.conv_general_dilated(q1, p["fin_q"], (1, 1), pads9,
                                        dimension_numbers=sp.CONV_DIMS,
                                        preferred_element_type=jnp.int32)
        yp = acc2.astype(jnp.float32) * (p["fin_ws"] / p["s1"])
        yp = yp + jnp.tile(p["fin_b"], 16).astype(jnp.float32)
        return sp.depth_to_space(jnp.tanh(yp), 4)

    fetch = lambda f: (lambda q, v: jnp.sum(f(q, v).astype(jnp.float32)))

    ms0 = timeit(jax.jit(fetch(r.apply_tail)), qp, trunk)
    log(f"T0 tail (current): {ms0:7.1f} ms/batch  ({(ms0 - 29) / 8:5.2f} ms/f)")
    ms1 = timeit(jax.jit(fetch(tail_t1)), t1p, trunk)
    log(f"T1 tail (r=1 up) : {ms1:7.1f} ms/batch  ({(ms1 - 29) / 8:5.2f} ms/f)")

    # T1 sub-pieces
    def t1_up(p, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters).astype(jnp.bfloat16)
        q0 = jnp.clip(jnp.round(y.astype(jnp.float32) * p["s0"]), -127, 127
                      ).astype(jnp.int8)
        acc = lax.conv_general_dilated(q0, p["up_q"], (1, 1), pads1,
                                       dimension_numbers=sp.CONV_DIMS,
                                       preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * (p["up_ws"] / p["s0"])
        y1 = y1 + jnp.tile(p["up_b"], 4).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        return jnp.clip(jnp.round(y1 * p["s1"]), -127, 127).astype(jnp.int8)

    q1d = jax.jit(t1_up)(t1p, trunk)
    ms_up = timeit(jax.jit(fetch(t1_up)), t1p, trunk)
    log(f"T1 up+quant      : {ms_up:7.1f} ms/batch ({(ms_up - 29) / 8:5.2f} ms/f)")

    def t1_s2d(p, v):
        return sp.space_to_depth(v, 2)

    ms_s2d = timeit(jax.jit(lambda p, v: jnp.sum(
        sp.space_to_depth(v, 2).astype(jnp.int32))), t1p, q1d)
    log(f"T1 s2d int8      : {ms_s2d:7.1f} ms/batch ({(ms_s2d - 29) / 8:5.2f} ms/f)")

    # quality
    out0 = np.asarray(jax.jit(r.apply_tail)(qp, trunk[:1]))
    out1 = np.asarray(jax.jit(tail_t1)(t1p, trunk[:1]))
    mse = float(np.mean((out0 - out1) ** 2))
    log(f"T1 vs T0 PSNR: {10 * np.log10(4.0 / max(mse, 1e-12)):.2f} dB")

    # full-path fps estimate with T1 tail
    def full_t1(packed, x):
        p, q = packed
        return tail_t1(p, r.apply_trunk(q, r.apply_stem(q, x)))

    ms_full = timeit(jax.jit(fetch(full_t1)), (t1p, qp), x8)
    log(f"T1 full b8: {ms_full:7.1f} ms/batch = {8 / ms_full * 1e3:6.2f} fps")


if __name__ == "__main__":
    main()
