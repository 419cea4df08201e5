"""Distill/QAT walker step throughput A/B (VERDICT r4 item 3).

Round 4's walker ran 0.78 s/step at batch 1 (the pixel-tail fwd+bwd
temps at 540p are ~2 GB each; batch 2 exceeded HBM), throttling the QAT
lever to a few k steps per round. This measures steps/sec and samples/sec
for remat on/off at batch 1/2/4/8 (x2 geometry, teacher 16 -> student 8,
the x2_k8 configuration) so the campaign runs at the best operating
point. Run on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(*a):
    print(*a, flush=True)


def main():
    import optax

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.train import create_generator_state
    from video_cycle_gan_upscaling_tpu.train.distill import (
        make_walk_distill_step,
        select_student_blocks,
        student_params_from_teacher,
    )
    from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
        load_demo_generator_params,
    )

    factor = int(os.environ.get("VCGU_AB_FACTOR", "2"))
    hw = (540, 960) if factor == 2 else (270, 480)
    n_t, n_s = 16, int(os.environ.get("VCGU_AB_BLOCKS", "8"))
    hint = os.environ.get("VCGU_AB_HINT", "0") == "1"
    log(f"devices: {jax.devices()}  x{factor} {hw} K={n_s} hint={hint}")

    tp = load_demo_generator_params(factor)
    assert tp is not None
    sp = student_params_from_teacher(tp, n_s)
    student = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=factor,
                           res_block_num=n_s, dtype=jnp.bfloat16,
                           phase_tail=False, head_block=4)
    pool = jax.jit(lambda k: jax.random.uniform(
        k, (4, *hw, 3), jnp.float32, -1, 1))(jax.random.PRNGKey(0))

    for remat in (True, False):
        for batch in (1, 2, 4, 8):
            try:
                state = create_generator_state(
                    student, jax.random.PRNGKey(0),
                    jnp.zeros((1, *hw, 3), jnp.float32),
                    tx=optax.adam(1e-4))
                state = state.replace(params=jax.device_put(sp))
                step = make_walk_distill_step(
                    n_s, n_t, factor, hw, batch,
                    hint_weight=0.5 if hint else 0.0,
                    feat_weight=0.1 if hint else 0.0,
                    remat=remat)
                t0 = time.perf_counter()
                state, m = step(state, tp, pool)
                float(m["loss"])  # force
                compile_s = time.perf_counter() - t0
                n = 6
                t0 = time.perf_counter()
                for _ in range(n):
                    state, m = step(state, tp, pool)
                    float(m["loss"])
                dt = (time.perf_counter() - t0) / n
                log(f"remat={int(remat)} batch={batch}: {dt:.3f} s/step = "
                    f"{batch / dt:.2f} samples/s  (compile {compile_s:.0f}s,"
                    f" loss {float(m['loss']):.4f})")
                del state
            except Exception as e:
                log(f"remat={int(remat)} batch={batch}: FAILED "
                    f"{type(e).__name__}: {str(e)[:140]}")
                break


if __name__ == "__main__":
    main()
