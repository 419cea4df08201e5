"""A/B: fused Pallas S=(4,8) head kernel vs the XLA formulation, both
isolated at the two product geometries and in-graph (full apply_u8).

Isolated input shapes (x-packed up-conv output, c_up=256):
  x2 540p: [8, 540, 480, 2048]
  x4 mid:  [8, 540, 480, 2048]   (same — the x4 chain reaches the same
                                  canonical 540p stream before the head)
so one geometry covers both factors; int8 (tail8/turbo head) and bf16
(hybrid head) variants, emit_u8 (clip path) epilogue.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from video_cycle_gan_upscaling_tpu.ops import head_conv
from video_cycle_gan_upscaling_tpu.ops.pallas import head_s48

RPC_MS = 29.0
BATCH = 8
H, W2, K2, CO = 540, 480, 2048, 96


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    per_f = (ms - RPC_MS) / BATCH
    log(f"{name:46s}: {ms:7.1f} ms/batch = {per_f:6.2f} ms/f")
    return per_f


def xla_head(px):
    def f(q1, wq, ws, b):
        yp = jnp.tanh(head_conv.head_conv_s48_pre(q1, wq, ws, b, px))
        return jnp.clip(jnp.round((yp + 1.0) * 127.5), 0, 255
                        ).astype(jnp.uint8)
    return f


def run_isolated():
    rng = np.random.default_rng(0)
    wq_i8 = jnp.asarray(rng.integers(-127, 128, (6, 4, K2, CO)), jnp.int8)
    wq_bf = jnp.asarray(rng.uniform(-0.03, 0.03, (6, 4, K2, CO)),
                        jnp.bfloat16)
    ws = jnp.asarray(rng.uniform(1e-4, 3e-4, (CO,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.2, 0.2, (CO,)), jnp.float32)
    px = (2, 0)

    q_i8 = jax.jit(lambda k: jax.random.randint(
        k, (BATCH, H, W2, K2), -127, 128, jnp.int32).astype(jnp.int8)
    )(jax.random.PRNGKey(1))
    th = head_s48._pick_th(H // 2, W2 // 2, 2 * K2, CO, 1, 1)
    log(f"int8 pallas block rows th = {th}")
    timeit("head int8 XLA (conv+tanh+u8)", xla_head(px), q_i8, wq_i8, ws, b)
    timeit("head int8 Pallas fused",
           lambda q: head_s48.head_s48_fused(q, wq_i8, ws, b, px,
                                             emit_u8=True), q_i8)
    q_i8.delete()
    q_bf = jax.jit(lambda k: jax.random.uniform(
        k, (BATCH, H, W2, K2), jnp.bfloat16, -1, 1))(jax.random.PRNGKey(2))
    th = head_s48._pick_th(H // 2, W2 // 2, 2 * K2, CO, 2, 1)
    log(f"bf16 pallas block rows th = {th}")
    timeit("head bf16 XLA (conv+tanh+u8)", xla_head(px), q_bf, wq_bf, None, b)
    timeit("head bf16 Pallas fused",
           lambda q: head_s48.head_s48_fused(q, wq_bf, None, b, px,
                                             emit_u8=True), q_bf)
    q_bf.delete()


def run_ingraph(factor):
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    hw = (540, 960) if factor == 2 else (270, 480)
    for quant in ("tail", "tail8"):
        model = UpscalerOrig(kernel_size=5, filters=64,
                             upscale_factor=factor, res_block_num=16,
                             dtype=jnp.bfloat16, phase_tail=True)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *hw, 3), jnp.float32))["params"]
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                           tile_hw=hw, quant=quant)
        qp = jax.device_put(r.qp)
        img = Image.open("/root/repo/docs/demo/input_480x270.png").convert(
            "RGB").resize((hw[1], hw[0]), Image.BICUBIC)
        cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
        qp = r.calibrate(qp, jax.device_put(cal))
        x = jax.jit(lambda k: jax.random.uniform(
            k, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))
        timeit(f"x{factor} {quant} apply_u8 [head="
               f"{'XLA' if os.environ.get('VCGU_HEAD_XLA') == '1' else 'Pallas'}]",
               r.apply_u8, qp, x)


def main():
    log(f"devices: {jax.devices()}  VCGU_HEAD_XLA="
        f"{os.environ.get('VCGU_HEAD_XLA', '0')}")
    if os.environ.get("VCGU_HEAD_XLA") != "1":
        run_isolated()
    for factor in (2, 4):
        run_ingraph(factor)


if __name__ == "__main__":
    main()
