"""Round-3 scout I: decompose the x4 tail8+exact operating point.

After the exact-phase stage-1 landed, x4 tail8 measures 17.44 ms/f
per-batch (53.35 fps official clip). 60 fps needs <=16.7 ms/f of
on-device time; this scout ranks the remaining pieces:

  trunk | +stage0+canonical | +stage1 exact-phase (int8 emits)
        | full apply_u8 (per-phase head accs + epilogue + d2s)

plus a frame-batch sweep of the full apply (8/12/16) — the x4 LR
frames are 1/4 the x2 pixels, so the b8 sweet spot measured at x2 need
not transfer.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

RPC_MS = 29.0
HW = (270, 480)


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, batch, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / batch
    log(f"{name:52s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f")
    return per_f


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
    from video_cycle_gan_upscaling_tpu.ops import nn as vops

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    r = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                       tile_hw=HW, quant="tail8")
    assert r.up_exact
    qp = jax.device_put(r.qp)
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert(
        "RGB").resize((HW[1], HW[0]), Image.BICUBIC)
    cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    qp = r.calibrate(qp, jax.device_put(cal))

    B = 8
    x = jax.jit(lambda k: jax.random.uniform(
        k, (B, *HW, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    t_trunk = timeit("stem+trunk (bf16)",
                     lambda qp, x: r.apply_trunk(qp, r.apply_stem(qp, x)),
                     qp, x, batch=B)

    def to_canonical(qp, x):
        t = r.apply_trunk(qp, r.apply_stem(qp, x))
        n, hh, wp_, cp = t.shape
        y = t.reshape(n, hh, wp_ * r.pack, r.filters).astype(jnp.float32)
        from video_cycle_gan_upscaling_tpu.ops.pallas import pair_conv
        n0, h0_, w0_, c0_ = y.shape
        y0 = pair_conv.pair_conv_fused(
            y.reshape(n0, h0_, w0_ // 2, 2 * c0_), qp["up0_w_q"],
            pads=r.up0_pads, w_scales=qp["up0_w_ws"],
            bias=qp["up0_b_c"], in_scales=jnp.tile(qp["tail_s0"], 2))
        return r._up0_to_canonical(y0)

    t_can = timeit("+ stage0 up conv + canonical", to_canonical, qp, x,
                   batch=B)

    def to_parts(qp, x):
        y = to_canonical(qp, x).astype(jnp.float32)
        q0 = jnp.clip(jnp.round(y * qp["tail_sm"]), -127, 127
                      ).astype(jnp.int8)
        s1 = qp["tail_s1"]
        cq = qp["upx_b_c"].shape[0] // 4
        out = 0.0
        for ph in range(4):
            acc = lax.conv_general_dilated(
                q0, qp[f"upx{ph}_w_q"], (1, 1), r.up_phase_pads[ph],
                dimension_numbers=sp.CONV_DIMS,
                preferred_element_type=jnp.int32)
            z = (acc.astype(jnp.float32) * qp[f"upx{ph}_ws"]
                 + qp["upx_b_c"][ph * cq:(ph + 1) * cq])
            z = vops.leaky_relu(z, 0.2)
            z = jnp.clip(jnp.round(z * s1[ph * cq:(ph + 1) * cq]),
                         -127, 127).astype(jnp.int8)
            out = out + jnp.sum(z.astype(jnp.float32))
        return out

    probe = jax.jit(to_parts)
    float(probe(qp, x))
    t0 = time.perf_counter()
    for _ in range(8):
        float(probe(qp, x))
    ms = (time.perf_counter() - t0) / 8 * 1e3
    t_up1 = (ms - RPC_MS) / B
    log(f"{'+ stage1 exact-phase (4 int8 convs+emits)':52s}: "
        f"{ms:7.1f} ms/batch = {t_up1:6.2f} ms/f")

    t_full = timeit("full apply_u8 (per-phase head + epi + d2s)",
                    r.apply_u8, qp, x, batch=B)
    log(f"pieces/f: trunk {t_trunk:.2f}, stage0+canon "
        f"{t_can - t_trunk:.2f}, up1 {t_up1 - t_can:.2f}, "
        f"head+glue {t_full - t_up1:.2f}")

    for b in (12, 16):
        xb = jax.jit(lambda k: jax.random.uniform(
            k, (b, *HW, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(2))
        timeit(f"full apply_u8 @ batch {b}", r.apply_u8, qp, xb, batch=b)


if __name__ == "__main__":
    main()
