"""Round-3 scouting (VERDICT r2 items 1-2) on the real TPU:

1. trunk per-frame time at b4 vs b8, revisit vs partial stats mode —
   runs down the b8 trunk regression (18 vs 15 ms/f) and tests the
   per-step-partial-stats kernel (fully parallel grid, no revisited
   output).
2. up-conv formulations: the shipped [1,1,128,2048] block-diagonal XLA
   conv vs the exact K=64 GEMM (dot_general) it actually is — the
   x-packed W-pair fold duplicates one [64,1024] matrix across two
   phases, so the conv does 2x padded FLOPs AND may hit a bad XLA conv
   path; a plain dot has neither problem.
3. clip schedule: 16x8 (official) vs 32x4 frame chunks.
4. HBM copy-bandwidth probe (roofline denominator).
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
RPC_MS = 29.0


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, rounds=8):
    float(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(fn(*args))
    return (time.perf_counter() - t0) / rounds * 1e3


def fetch(f):
    return jax.jit(lambda q, v: jnp.sum(f(q, v).astype(jnp.float32)))


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops import head_conv
    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=FACTOR,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *FRAME_HW, 3), jnp.float32))
    params32 = variables["params"]

    # ---- 4. HBM bandwidth probe (copy in = copy out; 2x bytes/elem) ----
    big = jax.device_put(jnp.zeros((64, 1024, 1024), jnp.float32))  # 256 MB

    def copy_probe(_, v):
        return jnp.sum(v * 1.0000001)  # forced read (no copy write)

    ms = timeit(jax.jit(copy_probe), None, big)
    gbps_read = big.nbytes / ((ms - RPC_MS) * 1e-3) / 1e9
    log(f"HBM read probe: {ms:.1f} ms -> ~{gbps_read:.0f} GB/s effective")

    # ---- 1. trunk b4/b8 x stats modes --------------------------------
    xs = {b: jax.device_put(jnp.asarray(np.random.default_rng(b).uniform(
        -1, 1, (b, *FRAME_HW, 3)), jnp.float32)) for b in (4, 8)}
    runners = {}
    for mode in ("revisit", "partial"):
        r = FastOrigRunner(params32, res_block_num=16, upscale_factor=FACTOR,
                           tile_hw=FRAME_HW, quant=True, stats_mode=mode)
        qp = jax.device_put(r.qp)
        qp = r.calibrate(qp, xs[4][:1])  # not jitted: host-side refold
        runners[mode] = (r, jax.device_put(qp))

    stems = {}
    for mode in ("revisit", "partial"):
        r, qp = runners[mode]
        for b in (4, 8):
            h0 = jax.jit(r.apply_stem)(qp, xs[b])
            stems[(mode, b)] = h0
            ms = timeit(fetch(r.apply_trunk), qp, h0)
            log(f"trunk int8 {mode} b{b}: {ms:7.1f} ms/batch = "
                f"{(ms - RPC_MS) / b:5.2f} ms/f")

    # ---- 2. tail formulations at b8 (int8, calibrated) ----------------
    r, qp = runners["revisit"]
    trunk8 = jax.jit(r.apply_trunk)(qp, stems[("revisit", 8)])
    ms = timeit(fetch(r.apply_tail), qp, trunk8)
    log(f"tail int8 current b8: {ms:7.1f} ms/batch = "
        f"{(ms - RPC_MS) / 8:5.2f} ms/f")

    # K=64 GEMM tail: wk1's block-diagonal [1,1,128,2048] conv is two
    # copies of one [64,1024] matrix; apply it as a plain dot instead.
    up_k = params32["upscale_0"]["conv_transp"]["kernel"].astype(jnp.float32)
    w64, _, _ = sp._rearrange_transpose_kernel(up_k, 2)
    w64 = w64.reshape(64, 1024)
    amax = jnp.max(jnp.abs(w64), axis=0, keepdims=True)
    ws64 = jnp.maximum(amax, 1e-8) / 127.0
    w64q = jnp.clip(jnp.round(w64 / ws64), -127, 127).astype(jnp.int8)
    w64q = jax.device_put(w64q)
    ws64 = jax.device_put(ws64.reshape(-1))

    def tail_dot64(q, t):
        n, h, wp_, cp = t.shape
        y = t.reshape(n, h, wp_ * r.pack, r.filters).astype(jnp.float32)
        q0 = jnp.clip(jnp.round(y * q["tail_s0"]), -127, 127
                      ).astype(jnp.int8)
        acc = lax.dot_general(q0.reshape(-1, 64), w64q,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * (ws64 / q["tail_s0"])
        y1 = y1 + jnp.tile(q["up_b_0"], 4).astype(jnp.float32)
        y1 = vops.leaky_relu(y1, 0.2)
        q1 = jnp.clip(jnp.round(y1 * q["tail_s1"]), -127, 127
                      ).astype(jnp.int8)
        q1 = q1.reshape(n, h, (wp_ * r.pack) // 2, 2048)
        yp = head_conv.head_conv_s48(
            q1, q["final_w_q"], q["final_w_ws"] / q["tail_s1"],
            jnp.tile(q["final_b"], 32).astype(jnp.float32),
            r.final_px_q)
        return sp.depth_to_space_axes(yp, 4, 8)

    ms = timeit(fetch(tail_dot64), qp, trunk8)
    log(f"tail int8 dot64   b8: {ms:7.1f} ms/batch = "
        f"{(ms - RPC_MS) / 8:5.2f} ms/f")
    # parity (same per-out-channel quant scales -> should be ~bit-exact)
    a = jax.jit(r.apply_tail)(qp, trunk8[:1])
    b_ = jax.jit(tail_dot64)(qp, trunk8[:1])
    mse = float(jnp.mean((a.astype(jnp.float32) - b_.astype(jnp.float32))
                         ** 2))
    log(f"tail dot64 vs current mse: {mse:.3e}")

    # ---- 3. clip schedules ------------------------------------------
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    for mode in ("revisit", "partial"):
        rr, qq = runners[mode]
        up = make_tiled_upscaler(rr.apply, FRAME_HW, FRAME_HW, 16, FACTOR)
        for k, b in ((16, 8), (32, 4)):
            try:
                clip = jnp.stack([xs[b]] * k)
                probe = jax.jit(
                    lambda p, c: jnp.sum(up.clip(p, c).astype(jnp.float32)))
                float(probe(qq, clip))
                t0 = time.perf_counter()
                for _ in range(4):
                    float(probe(qq, clip))
                dt = (time.perf_counter() - t0) / 4
                log(f"clip {mode} {k}x{b}: {dt * 1e3:7.1f} ms = "
                    f"{k * b / dt:6.2f} fps")
            except Exception as e:
                log(f"clip {mode} {k}x{b} FAILED {type(e).__name__}: "
                    f"{str(e)[:150]}")


if __name__ == "__main__":
    main()
