"""Trunk block-size sweep: fused_conv picks the largest block (th)
fitting a fixed VMEM budget; this sweeps the budget to test whether
smaller blocks (more grid parallelism / better DMA overlap) or larger
ones (fewer per-step overheads) move the bf16 trunk off its ~72% MFU
plateau at both product geometries."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

RPC_MS = 29.0
BATCH = 8


def log(*a):
    print(*a, flush=True)


def main():
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops.pallas import fused_conv as fc

    log(f"devices: {jax.devices()}")
    for hw, factor in (((540, 960), 2), ((270, 480), 4)):
        model = UpscalerOrig(kernel_size=5, filters=64,
                             upscale_factor=factor, res_block_num=16,
                             dtype=jnp.bfloat16, phase_tail=True)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *hw, 3), jnp.float32))["params"]
        r = FastOrigRunner(params, res_block_num=16, upscale_factor=factor,
                           tile_hw=hw, quant=False)
        qp = jax.device_put(r.qp)
        x = jax.jit(lambda k: jax.random.uniform(
            k, (BATCH, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(1))
        default = fc._VMEM_BUDGET
        for budget_mb in (16, 24, 32, 40, 56):
            fc._VMEM_BUDGET = budget_mb * 1024 * 1024
            th = fc._pick_th(hw[0], hw[1] // r.pack, r.cp, 5, 5,
                             has_res=True, quant=False)
            probe = jax.jit(lambda qp, x: jnp.sum(
                r.apply_trunk(qp, r.apply_stem(qp, x)
                              ).astype(jnp.float32)))
            try:
                float(probe(qp, x))
            except Exception as e:
                log(f"x{factor} trunk bf16 @ budget {budget_mb:3d}MB "
                    f"(th={th}): FAILED ({type(e).__name__}: "
                    f"{str(e)[:100]})")
                continue
            t0 = time.perf_counter()
            for _ in range(8):
                float(probe(qp, x))
            ms = (time.perf_counter() - t0) / 8 * 1e3
            log(f"x{factor} trunk bf16 @ budget {budget_mb:3d}MB "
                f"(th={th}): {ms:7.1f} ms/batch = "
                f"{(ms - RPC_MS) / BATCH:6.2f} ms/f")
        fc._VMEM_BUDGET = default


if __name__ == "__main__":
    main()
