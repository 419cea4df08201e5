"""Round-3 perf scouting on TPU for the calibrated-int8 fast runner:

1. piecewise tail timings (quantize / up conv / dequant+leaky+requant /
   final conv / tanh+depth_to_space) at the official b8 point,
2. frame-batch scaling 8/12/16 (the int8 tail halved HBM traffic),
3. chunked dispatch: lax.map over K micro-batches inside ONE jit call,
   amortizing the ~29 ms tunnel-RPC floor over K*batch frames.
"""

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
    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
    from jax import lax

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
    log(f"tail calibrated: {r.tail_calibrated}")

    # --- 1. tail piecewise at b2 (raw int32 conv outputs OOM at b8:
    # 15.8G for [8,270,480,4096] s32 — the full path only fits because
    # XLA fuses the dequant epilogue into the conv) -----------------------
    x2 = x8[:2]
    trunk = jax.jit(r.apply_trunk)(qp, jax.jit(r.apply_stem)(qp, x2))

    def tail_unpack(q, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters).astype(r.dtype)
        return sp.space_to_depth(y, r.block0)

    y0 = jax.jit(tail_unpack)(qp, trunk)

    def piece_q0(q, y):
        return jnp.clip(jnp.round(y.astype(jnp.float32) * q["tail_s0"]),
                        -127, 127).astype(jnp.int8)

    q0 = jax.jit(piece_q0)(qp, y0)

    pads0 = r.up_plans[0][0]

    def piece_upconv(q, v):
        return lax.conv_general_dilated(v, q["up_w_0_q"], (1, 1), pads0,
                                        dimension_numbers=sp.CONV_DIMS,
                                        preferred_element_type=jnp.int32)

    acc = jax.jit(piece_upconv)(qp, q0)
    rr = r.block0 * 2

    def piece_mid(q, a):
        y1 = a.astype(jnp.float32) * (q["up_w_0_ws"] / q["tail_s0"])
        y1 = y1 + jnp.tile(q["up_b_0"], rr * rr).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        return jnp.clip(jnp.round(y1 * q["tail_s1"]), -127, 127
                        ).astype(jnp.int8)

    q1 = jax.jit(piece_mid)(qp, acc)
    fpads = r.final_plan[0]

    def piece_final(q, v):
        return lax.conv_general_dilated(v, q["final_w_q"], (1, 1), fpads,
                                        dimension_numbers=sp.CONV_DIMS,
                                        preferred_element_type=jnp.int32)

    acc2 = jax.jit(piece_final)(qp, q1)

    def piece_out(q, a):
        yp = a.astype(jnp.float32) * (q["final_w_ws"] / q["tail_s1"])
        yp = yp + jnp.tile(q["final_b"], rr * rr).astype(jnp.float32)
        return sp.depth_to_space(jnp.tanh(yp), rr)

    fetch = lambda f: (lambda q, v: jnp.sum(f(q, v).astype(jnp.float32)))
    for name, fn, arg in (
            ("unpack+s2d   ", tail_unpack, trunk),
            ("quantize q0  ", piece_q0, y0),
            ("up conv int8 ", piece_upconv, q0),
            ("deq+leaky+q1 ", piece_mid, acc),
            ("final conv   ", piece_final, q1),
            ("deq+tanh+d2s ", piece_out, acc2),
            ("tail total   ", r.apply_tail, trunk),
            ("trunk        ", r.apply_trunk, jax.jit(r.apply_stem)(qp, x2)),
    ):
        ms = timeit(jax.jit(fetch(fn)), qp, arg)
        log(f"b2 {name}: {ms:7.1f} ms/batch  ({(ms - 29) / 2:5.2f} ms/frame - RPC)")

    # --- 2. batch scaling -----------------------------------------------
    for batch in (8, 12, 16):
        try:
            xb = jax.device_put(jnp.asarray(np.random.default_rng(1).uniform(
                -1, 1, (batch, *FRAME_HW, 3)), jnp.float32))
            ms = timeit(jax.jit(fetch(r.apply)), qp, xb)
            log(f"full b{batch}: {ms:7.1f} ms/batch = {batch / ms * 1e3:6.2f} fps")
        except Exception as e:
            log(f"full b{batch}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # --- 3. chunked dispatch (one RPC per K micro-batches) ---------------
    for k, batch in ((2, 8), (4, 8), (2, 12)):
        try:
            xs = jax.device_put(jnp.asarray(np.random.default_rng(2).uniform(
                -1, 1, (k, batch, *FRAME_HW, 3)), jnp.float32))

            def chunked(q, v):
                outs = lax.map(lambda xb: jnp.sum(r.apply(q, xb)), v)
                return jnp.sum(outs)

            ms = timeit(jax.jit(chunked), qp, xs)
            fps = k * batch / ms * 1e3
            log(f"chunked k{k} b{batch}: {ms:7.1f} ms/call = {fps:6.2f} fps")
        except Exception as e:
            log(f"chunked k{k} b{batch}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
