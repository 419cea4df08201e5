"""Pre-warm the persistent TPU compile cache for bench.py's critical path.

The driver runs `python bench.py` under a timeout at the end of every
round. After a driver host migration the persistent compile cache
(.jax_cache) starts EMPTY, and a fully cold bench run pays a 2-10 min
remote compile for every graph shape in the x2 mode matrix (~15 batch-1
gate graphs + timing graphs) — the failure mode that cost round 4 its
official record (BENCH_r04.json rc=124).

This script compiles the SAME graphs bench.py traces (it imports bench
and reuses its helpers so the HLO — and therefore the cache key — is
identical), ordered by headline-criticality:

1. teacher bf16 gate reference (batch-1 apply, 540p),
2. the shipping headline path (stu6-bf16): gate + both timing graphs,
3. the fallback student (stu8-bf16): gate + timing,
4. teacher bf16 timing (the forced last-resort path),
5. every remaining x2 mode's gate graph + calibration graphs.

Run it under `timeout` in the background; killing it mid-way is safe —
every completed compile is already persisted, and the ordering means a
partial warm still covers the headline. Usage:

  cd /root/repo && timeout 2400 python scripts/warm_bench_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402  (sets jax_compilation_cache_dir)

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def main():
    from flax import serialization

    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    log(f"devices: {jax.devices()}")
    hw = bench.FRAME_HW
    frames = [bench._demo_frame(n, hw) for n in bench.EVAL_FRAMES]
    cal = bench._cal_batch(hw)
    params = bench._bench_params(bench.FACTOR, bench.TILE_HW)

    stu_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "students")

    def student_params(stem):
        with open(os.path.join(stu_dir, stem + ".msgpack"), "rb") as fh:
            return serialization.msgpack_restore(fh.read())

    def gate_graph(tag, r, qp):
        """The _gate_all per-mode graphs: batch-1 apply (+ per-frame
        calibration for quantized modes, mirroring the per-clip
        protocol)."""
        ap = jax.jit(r.apply)
        clip_sel = getattr(r, "tail_clip_selected", 1.0)
        if not isinstance(clip_sel, float):
            clip_sel = 1.0
        for f in frames:
            qp_f = qp
            if r.tail_quant_ready or r.quant:
                qp_f = r.calibrate(jax.device_put(dict(r.qp)), f[None],
                                   tail_clip=clip_sel)
            np.asarray(ap(qp_f, f[None]))
        log(f"gate graph warm: {tag}")

    def timing_graphs(tag, r, qp, batch=bench.FRAME_BATCH):
        """The _measure graphs: per-batch dispatch + streaming uint8
        clip dispatch (the headline-timing graphs)."""
        up = make_tiled_upscaler(r.apply, hw, bench.TILE_HW, bench.OVERLAP,
                                 bench.FACTOR, apply_fn_u8=r.apply_u8)
        batch0 = jax.device_put(jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (batch, *hw, 3)),
            jnp.float32))
        probe = jax.jit(lambda p, x: bench._force(up.batch(p, x)))
        float(probe(qp, batch0))
        log(f"batch timing graph warm: {tag} (b{batch})")
        gen_clip = jax.jit(lambda key: jax.random.randint(
            key, (bench.CLIP_CHUNKS, batch, *hw, 3), 0, 256,
            jnp.int32).astype(jnp.uint8))
        clip = gen_clip(jax.random.PRNGKey(7))
        probe_clip = jax.jit(lambda p, c: bench._force(up.clip_u8(p, c)))
        float(probe_clip(qp, clip))
        log(f"clip timing graph warm: {tag} ({bench.CLIP_CHUNKS}x{batch})")

    # --- 1. teacher bf16: the gate reference every mode compares against
    r_b = FastOrigRunner(params, res_block_num=16,
                         upscale_factor=bench.FACTOR,
                         tile_hw=bench.TILE_HW, quant=False)
    qp_b = jax.device_put(r_b.qp)
    gate_graph("bf16(teacher)", r_b, qp_b)

    # --- 2./3. the shipping headline students, fastest first
    students = {}
    for stem, k in (("x2_k6", 6), ("x2_k8", 8)):
        try:
            sp = student_params(stem)
        except Exception as e:
            log(f"student {stem} unavailable: {e}")
            continue
        students[stem] = (sp, k)
        r = FastOrigRunner(sp, res_block_num=k, upscale_factor=bench.FACTOR,
                           tile_hw=bench.TILE_HW, quant=False)
        qp = jax.device_put(r.qp)
        gate_graph(f"stu{stem.split('_k')[1]}-bf16", r, qp)
        timing_graphs(f"stu{stem.split('_k')[1]}-bf16", r, qp)

    # --- 4. teacher bf16 timing: the guaranteed-passer fallback
    timing_graphs("bf16(teacher)", r_b, qp_b)

    # --- 5. remaining x2 gate graphs (teacher quant modes, then student
    # quant modes) — order matches _build_runners so a timeout trims the
    # least-critical tail
    teacher_modes = [("i8tail", "tail"), ("tail8", "tail8"),
                     ("mix", "mix:13,14,15"), ("trunkonly", "trunk"),
                     ("int8", True)]
    for tag, quant in teacher_modes:
        r = FastOrigRunner(params, res_block_num=16,
                           upscale_factor=bench.FACTOR,
                           tile_hw=bench.TILE_HW, quant=quant)
        qp = jax.device_put(r.qp)
        if r.tail_quant_ready or r.quant:
            qp = r.calibrate(jax.device_put(qp), cal)
        gate_graph(tag, r, qp)

    stu_quant = [("x2_k6", ["trunk", "tail8"]),
                 ("x2_k8", ["trunk", "tail8"]),
                 ("x2_k8t", ["int8", "tail8", "trunk"])]
    mode_map = {"trunk": "trunk", "tail8": "tail8", "int8": True}
    for stem, modes in stu_quant:
        if stem not in students and stem != "x2_k8t":
            continue
        try:
            sp, k = students.get(stem, (None, None))
            if sp is None:
                sp = student_params(stem)
                k = 8
        except Exception as e:
            log(f"student {stem} unavailable: {e}")
            continue
        for mode in modes:
            r = FastOrigRunner(sp, res_block_num=k,
                               upscale_factor=bench.FACTOR,
                               tile_hw=bench.TILE_HW, quant=mode_map[mode])
            qp = jax.device_put(r.qp)
            if r.tail_quant_ready or r.quant:
                qp = r.calibrate(jax.device_put(qp), cal)
            gate_graph(f"stu{stem.split('_k')[1]}-{mode}", r, qp)

    log("x2 section fully warm")


if __name__ == "__main__":
    main()
