"""Round-3 scout G: tail decomposition at the two product geometries.

The x4 (270p->1080p) clip runs only ~1.15x the x2 (540p->1080p) rate
even though its trunk does 1/4 the FLOPs (docs/PERF.md round-3 x4
section). Hypothesis: no waste — the x4 stage-1 up conv consumes the
256-channel mid stream (vs the 64-channel trunk output at x2), i.e. 4x
the contraction FLOPs, so the x4 tail is intrinsically heavier. This
scout measures the pieces (i8tail budget mode, batch 8, calibrated on
the demo frame) to confirm and to rank the remaining tail targets:

  trunk | +stage0+canonical (x4) | +requant+up conv+dequant | full tail

Timing protocol: scalar fetch per call (tunnel RPC floor ~29 ms
included, printed both ways).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from jax import lax

RPC_MS = 29.0
BATCH = 8


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, rounds=8, flops=None):
    # fn returns a scalar (stages reduce inside the jit so the multi-GB
    # stage tensors never become jit outputs — matches the fused reality)
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / BATCH
    mfu = ""
    if flops:
        # flops per FRAME; int8 peak 394e12, bf16 197e12 on v5e
        mfu = f"  ({flops / 1e9:.0f} GFLOP/f)"
    log(f"{name:44s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f on-device{mfu}")
    return per_f


def run(factor):
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
    from video_cycle_gan_upscaling_tpu.ops import head_conv
    from video_cycle_gan_upscaling_tpu.ops import nn as vops

    hw = (540, 960) if factor == 2 else (270, 480)
    log(f"=== x{factor} {hw[0]}x{hw[1]} -> {hw[0] * factor}p, i8tail, "
        f"batch {BATCH} ===")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=factor,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *hw, 3), jnp.float32))["params"]
    r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                       tile_hw=hw, quant="tail")
    qp = jax.device_put(r.qp)
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert(
        "RGB").resize((hw[1], hw[0]), Image.BICUBIC)
    cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    qp = r.calibrate(qp, jax.device_put(cal))

    x = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    h, w = hw
    c_up = 256
    # analytic conv FLOPs per frame (true, unpadded)
    f_trunk = 2 * h * w * (5 * 5 * 64) * 64 * 33
    f_up1_in = 64 if factor == 2 else 256
    hs, ws = (h, w) if factor == 2 else (2 * h, 2 * w)
    f_up1 = 2 * hs * ws * (5 * 5 // 4 * f_up1_in) * c_up * 4  # ~6.25 taps/phase avg
    f_head = 2 * (2 * hs) * (2 * ws) * (81 * c_up) * 3
    f_up0 = 0 if factor == 2 else 2 * h * w * (5 * 5 // 4 * 64) * c_up * 4

    t_trunk = timeit("stem+trunk (bf16)",
                     lambda qp, x: r.apply_trunk(qp, r.apply_stem(qp, x)),
                     qp, x, flops=f_trunk)

    def to_canonical(qp, x):
        t = r.apply_trunk(qp, r.apply_stem(qp, x))
        n, hh, wp_, cp = t.shape
        y = t.reshape(n, hh, wp_ * r.pack, r.filters).astype(jnp.float32)
        if r.times == 2:
            s0 = qp["tail_s0"]
            q0 = jnp.clip(jnp.round(y * s0), -127, 127).astype(jnp.int8)
            n0, h0_, w0_, c0_ = q0.shape
            acc0 = lax.conv_general_dilated(
                q0.reshape(n0, h0_, w0_ // 2, 2 * c0_), qp["up0_w_q"],
                (1, 1), r.up0_pads, dimension_numbers=sp.CONV_DIMS,
                preferred_element_type=jnp.int32)
            y0 = acc0.astype(jnp.float32) * qp["up0_w_ws"] + qp["up0_b_c"]
            y = r._up0_to_canonical(vops.leaky_relu(y0, 0.2))
        return y

    if factor == 4:
        t_can = timeit("+ stage0 up conv + canonical", to_canonical,
                       qp, x, flops=f_up0)

    def to_up1(qp, x):
        y = to_canonical(qp, x)
        s_in = qp["tail_sm"] if r.times == 2 else qp["tail_s0"]
        q0 = jnp.clip(jnp.round(y * s_in), -127, 127).astype(jnp.int8)
        n, hh, ww, c = q0.shape
        q0p = q0.reshape(n, hh, ww // 2, 2 * c)
        acc = lax.conv_general_dilated(
            q0p, qp["up_w_q"], (1, 1), r.up_pads_q,
            dimension_numbers=sp.CONV_DIMS,
            preferred_element_type=jnp.int32)
        y1 = acc.astype(jnp.float32) * qp["up_w_ws"] + qp["up_b_c"]
        return vops.leaky_relu(y1, 0.2)

    t_up1 = timeit("+ requant + stage1 up conv (int8)", to_up1,
                   qp, x, flops=f_up1)

    def full(qp, x):
        return r.apply_u8(qp, x)

    t_full = timeit("full apply_u8 (head bf16 + d2s)", full,
                    qp, x, flops=f_head)

    log(f"pieces/f: trunk {t_trunk:.2f}"
        + (f", stage0+canon {t_can - t_trunk:.2f}" if factor == 4 else "")
        + f", up1 {t_up1 - (t_can if factor == 4 else t_trunk):.2f}"
        + f", head+glue {t_full - t_up1:.2f}")
    log(f"ideal/f (int8 up convs @394T, bf16 trunk/head @197T): "
        f"trunk {f_trunk / 197e9:.2f}, up0 {f_up0 / 394e9:.2f}, "
        f"up1 {f_up1 / 394e9:.2f}, head {f_head / 197e9:.2f}")


def main():
    log(f"devices: {jax.devices()}")
    for factor in (2, 4):
        run(factor)


if __name__ == "__main__":
    main()
