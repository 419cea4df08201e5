"""Round-3 scout: fused per-phase stage-1 kernel at the x4 tail8 point.

The exact-phase stage-1 (4 XLA int8 convs + separate epilogues)
measured 7.24 ms/f vs a 4.14 ms/f compute ideal — the gap is the int32
accumulator's HBM round trip per phase (~0.5 GB/frame/phase). This
measures the pair_conv_fused per-phase dispatch (int8 in -> conv +
epilogue + int8 emit in one VMEM pass) against the ledgered XLA form:

  stage-1 isolated | full apply_u8 b8 | official-protocol clip 16x8

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exact_pallas_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

RPC_MS = 29.0
HW = (270, 480)
B = 8
CHUNKS = 16


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, frames, rounds=8):
    probe = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(probe(*args))
    t0 = time.perf_counter()
    for _ in range(rounds):
        float(probe(*args))
    ms = (time.perf_counter() - t0) / rounds * 1e3
    log(f"{name:46s}: {ms:7.1f} ms = {(ms - RPC_MS) / frames:6.2f} ms/f "
        f"({frames / ms * 1e3:.2f} fps raw)")
    return ms


def main():
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops.pallas import pair_conv
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    model = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=4,
                         res_block_num=16, dtype=jnp.bfloat16,
                         phase_tail=True)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *HW, 3), jnp.float32))["params"]
    r = FastOrigRunner(params, res_block_num=16, upscale_factor=4,
                       tile_hw=HW, quant="tail8")
    assert r.up_exact and r.head_quant
    qp = jax.device_put(r.qp)
    img = Image.open("/root/repo/docs/demo/input_480x270.png").convert(
        "RGB").resize((HW[1], HW[0]), Image.BICUBIC)
    cal = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
    qp = r.calibrate(qp, jax.device_put(cal))

    x = jax.jit(lambda k: jax.random.uniform(
        k, (B, *HW, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))

    # stage-1 isolated on a synthetic int8 canonical stream
    h2, w2 = 2 * HW[0], 2 * HW[1]
    c_mid = r.c_mid
    q0 = jax.jit(lambda k: jax.random.randint(
        k, (B, h2, w2, c_mid), -127, 128, jnp.int32).astype(jnp.int8))(
            jax.random.PRNGKey(2))
    s1 = qp["tail_s1"]
    cq = qp["upx_b_c"].shape[0] // 4

    def stage1(qp, q0):
        out = 0.0
        for ph in range(4):
            z = pair_conv.pair_conv_fused(
                q0, qp[f"upx{ph}_w_q"], pads=r.up_phase_pads[ph],
                w_scales=qp[f"upx{ph}_ws"],
                bias=qp["upx_b_c"][ph * cq:(ph + 1) * cq],
                out_scales=s1[ph * cq:(ph + 1) * cq])
            out = out + jnp.sum(z.astype(jnp.float32))
        return out

    probe = jax.jit(stage1)
    float(probe(qp, q0))
    t0 = time.perf_counter()
    for _ in range(8):
        float(probe(qp, q0))
    ms = (time.perf_counter() - t0) / 8 * 1e3
    log(f"{'stage-1 fused per-phase (isolated)':46s}: {ms:7.1f} ms = "
        f"{(ms - RPC_MS) / B:6.2f} ms/f")

    timeit("full apply_u8 b8 (fused stage-1)", r.apply_u8, qp, x, frames=B)

    up = make_tiled_upscaler(r.apply, HW, HW, 16, 4, apply_fn_u8=r.apply_u8)
    clip = jax.jit(lambda k: jax.random.randint(
        k, (CHUNKS, B, *HW, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
            jax.random.PRNGKey(7))
    probe_clip = jax.jit(
        lambda p, c: jnp.sum(up.clip_u8(p, c).astype(jnp.float32)))
    float(probe_clip(qp, clip))
    t0 = time.perf_counter()
    for _ in range(6):
        float(probe_clip(qp, clip))
    dt = (time.perf_counter() - t0) / 6
    log(f"clip {CHUNKS}x{B}: {dt * 1e3:.1f} ms = "
        f"{CHUNKS * B / dt:.2f} fps (streaming)")


if __name__ == "__main__":
    main()
