"""Round-3 scout F: decompose the i8tail quantization error by stage.

The budget gate is 46.33 dB and i8tail measured 46.21 on the flagship
(scripts/microbench_r3d.py) — 0.12 dB short. This scout isolates the four
tail error sources on a flagship-width model at small spatial size (CPU,
fast compiles):

  qi0  : int8 rounding of the trunk output (s0 input quant)
  qw_up: int8 rounding of the up-conv weights
  qi1  : int8 rounding of the up-conv output (s1 requant)
  qw_hd: int8 rounding of the head-conv weights

and sweeps clip ratios on s0/s1 (MSE-optimal clipping search) to see how
much margin better scale selection buys. Calibration on the demo frame,
eval on the held-out ukiyo frame (same protocol as bench.py).
"""

import functools

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax
from PIL import Image

HW = (96, 128)   # small spatial; flagship width (64 filters, 16 blocks)


def log(*a):
    print(*a, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10 * np.log10(4.0 / max(mse, 1e-12))


def frame(name, resample):
    img = Image.open(f"/root/repo/docs/demo/{name}").convert("RGB")
    arr = np.asarray(img.resize((HW[1], HW[0]), resample),
                     np.float32) / 127.5 - 1.0
    return jnp.asarray(arr, jnp.float32)


def q_oc(w, in_scales, in_axis, quant=True):
    """Fold per-input-lane act scales into w, then per-out-channel int8."""
    sh = [1] * w.ndim
    sh[in_axis] = -1
    w = np.asarray(w, np.float32) / np.asarray(in_scales,
                                               np.float32).reshape(sh)
    if not quant:
        return jnp.asarray(w), None
    amax = np.max(np.abs(w), axis=tuple(
        i for i in range(w.ndim) if i != w.ndim - 1), keepdims=True)
    s = 127.0 / np.maximum(amax, 1e-8)
    q = np.clip(np.round(w * s), -127, 127).astype(np.float32)  # int vals
    return jnp.asarray(q), jnp.asarray((1.0 / s).reshape(-1))


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops import head_conv
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
    from video_cycle_gan_upscaling_tpu.ops import nn as vops

    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=2,
                         res_block_num=16, dtype=jnp.float32,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    cal = frame("input_480x270.png", Image.BICUBIC)[None]
    held = frame("eval_ukiyo_1080p.jpg", Image.LANCZOS)[None]

    r = FastOrigRunner(params, res_block_num=16, upscale_factor=2,
                       tile_hw=HW, quant="tail", dtype=jnp.float32)
    qp = r.qp

    trunk_fn = jax.jit(lambda q, x: r.apply_trunk(q, r.apply_stem(q, x)))

    def unpack(t):
        n, h, wp_, cp = t.shape
        return t.reshape(n, h, wp_ * r.pack, r.filters).astype(jnp.float32)

    y_cal = unpack(trunk_fn(qp, cal))
    y_held = unpack(trunk_fn(qp, held))

    # bf16-path reference output on the held-out frame (f32 here)
    ref_out = jax.jit(r.apply)(qp, held)

    amax0, amax1 = jax.device_get(jax.jit(r._tail_amax)(qp, cal))
    m_up = r._tail_masters["up_pair"]     # [ny,nx,2C,4C']
    m_hd = r._tail_masters["head"]

    @functools.partial(jax.jit, static_argnames=("qi0", "qi1"))
    def tail_var(y, s0, s1, w_up, ws_up, w_hd, ws_hd, b_up, b_hd,
                 qi0=True, qi1=True):
        """Variant tail: inputs scaled by s0/s1 (rounded iff qi*), convs
        with pre-folded weights (quantized or f32 masters)."""
        z = y * s0
        if qi0:
            z = jnp.clip(jnp.round(z), -127, 127)
        n, h, w_, c = z.shape
        zp = z.reshape(n, h, w_ // 2, 2 * c)
        acc = lax.conv_general_dilated(zp, w_up, (1, 1), r.up_pads_q,
                                       dimension_numbers=sp.CONV_DIMS)
        y1 = acc * ws_up if ws_up is not None else acc
        y1 = vops.leaky_relu(y1 + b_up, 0.2)
        z1 = y1 * jnp.tile(s1, 2)
        if qi1:
            z1 = jnp.clip(jnp.round(z1), -127, 127)
        yp = head_conv.head_conv_s48(z1, w_hd, ws_hd, b_hd, r.final_px_q)
        return sp.depth_to_space_axes(yp, 4, 8)

    b_up = jnp.tile(qp["up_b_0"], 8).astype(jnp.float32)
    b_hd = jnp.tile(qp["final_b"], 32).astype(jnp.float32)
    ones0 = np.ones_like(amax0)
    ones1 = np.ones_like(amax1)

    def run(tag, qi0, qw_up, qi1, qw_hd, c0=1.0, c1=1.0, y=y_held):
        s0 = (127.0 / np.maximum(amax0 * c0, 1e-6)).astype(np.float32) \
            if (qi0 or qw_up) else ones0
        s1 = (127.0 / np.maximum(amax1 * c1, 1e-6)).astype(np.float32) \
            if (qi1 or qw_hd) else ones1
        w_up, ws_up = q_oc(m_up, np.tile(s0, 2), 2, quant=qw_up)
        w_hd, ws_hd = q_oc(m_hd, np.tile(s1, 2), 2, quant=qw_hd)
        out = tail_var(y, jnp.asarray(s0), jnp.asarray(s1), w_up, ws_up,
                       w_hd, ws_hd, b_up, b_hd, qi0=qi0, qi1=qi1)
        p = psnr(out, ref_out)
        log(f"{tag:28s}: {p:6.2f} dB")
        return p

    log("--- stage isolation (held-out frame) ---")
    run("all-f32 sanity", False, False, False, False)
    run("qi0 only (s0 input quant)", True, False, False, False)
    run("qw_up only", False, True, False, False)
    run("qi1 only (s1 requant)", False, False, True, False)
    run("qw_head only", False, False, False, True)
    run("full i8tail", True, True, True, True)

    log("--- clip-ratio sweep (full i8tail) ---")
    for c0 in (1.0, 0.9, 0.8, 0.7):
        for c1 in (1.0, 0.9, 0.8):
            run(f"clip c0={c0} c1={c1}", True, True, True, True,
                c0=c0, c1=c1)


if __name__ == "__main__":
    main()
