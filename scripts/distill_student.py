"""Distill a K-block student trunk from the 16-block bench teacher.

The round-3 verdict's one remaining x2 lever (docs/PERF.md round-4
candidates): the compliant 540p->1080p headline is trunk-bound (~71% of
the frame at ~80% MFU bf16) and W8A8 across the full 33-conv trunk is
error-capped ~10 dB under the budget gate — so the path to 60 fps is a
TRAINED smaller trunk. This script:

1. builds the bench teacher (UpscalerOrig, 16 blocks, PRNGKey(0) — the
   exact init bench.py measures) and its fused bf16 runner;
2. initializes a K-block student from the teacher's own weights
   (train/distill.py: evenly-spaced block subset);
3. distills on augmented real-frame content AT THE BENCH GEOMETRY (so
   InstanceNorm statistics match deployment exactly), target = the
   TEACHER'S RUNNER bf16 outputs (the function the bench quality gate
   references — the teacher-side runner-vs-modular numeric delta is
   absorbed into the training signal);
4. (--measure) runs the bench protocol on the trained student: clip fps
   + PSNR vs the TEACHER's bf16 runner on the held-out ukiyo frame,
   for each quantization mode.

Validation content (model_1080p.png) is disjoint from the training pool;
the ukiyo eval frame is never touched during training.

Usage (TPU):
  python scripts/distill_student.py --factor 2 --blocks 8 --steps 4000
  python scripts/distill_student.py --factor 2 --blocks 8 --measure-only
"""

import argparse
import json
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "docs", "demo")


def log(*a):
    print(*a, flush=True)


def _to_unit(img):
    return np.asarray(img, np.float32) / 127.5 - 1.0


def build_pools(frame_hw):
    """(train_pool [P,H,W,3], val_frames [V,H,W,3]) in [-1,1], f32.

    Train pool: the demo input frame (bench calibration content) resized
    to the bench geometry + exact-size crops of bicubic_1080p.png (same
    reference movie frame at 1080p — different scales read as different
    content under crops). Validation: model_1080p.png (a generator
    output — texture statistics unlike any training frame) — disjoint
    from the pool; the ukiyo gate frame is never loaded here."""
    from PIL import Image

    h, w = frame_hw
    train, val = [], []
    im = Image.open(os.path.join(DEMO, "input_480x270.png")).convert("RGB")
    train.append(_to_unit(im.resize((w, h), Image.BICUBIC)))

    def crops(path, out_list, n_xy):
        img = Image.open(path).convert("RGB")
        W, H = img.size
        nx, ny = n_xy
        for iy in range(ny):
            for ix in range(nx):
                x0 = (W - w) * ix // max(nx - 1, 1)
                y0 = (H - h) * iy // max(ny - 1, 1)
                out_list.append(_to_unit(img.crop((x0, y0, x0 + w, y0 + h))))
        out_list.append(_to_unit(img.resize((w, h), Image.LANCZOS)))

    crops(os.path.join(DEMO, "bicubic_1080p.png"), train, (3, 2))
    crops(os.path.join(DEMO, "model_1080p.png"), val, (2, 1))
    return np.stack(train), np.stack(val[:3])


def teacher_runner_forward(runner):
    def fwd(tqp, x):
        trunk = runner.apply_trunk(tqp, runner.apply_stem(tqp, x))
        n, h_, wp, cp = trunk.shape
        feat = trunk.reshape(n, h_, wp * runner.pack, runner.filters)
        return runner.apply_tail(tqp, trunk), feat

    return fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=2, choices=(2, 4))
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--peak-lr", type=float, default=2e-4)
    ap.add_argument("--feat-weight", type=float, default=0.1)
    ap.add_argument("--hint-weight", type=float, default=0.5)
    ap.add_argument("--hint-decay", type=int, default=0,
                    help="anneal hint+feat weights to 0 over N steps")
    ap.add_argument("--synth-prob", type=float, default=0.1,
                    help="pure-synthetic frame probability in the "
                    "augmented batches")
    ap.add_argument("--qat", default=None, metavar="SPEC",
                    help="fake-quant the named student trunk units during "
                    "training (mix-spec over student units, e.g. 'last17' "
                    "= all; scales frozen from an init-time calibration "
                    "on the demo frame)")
    ap.add_argument("--qat-tail", action="store_true",
                    help="fake-quant the student's TAIL during training "
                    "(W8A8 up convs + head, per-channel scales from an "
                    "init-time calibration) — lets the student absorb "
                    "the tail quantization error that MISSes the gate "
                    "on trained weights (docs/PERF.md round 4)")
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="default assets/students/x{F}_k{K}.msgpack")
    ap.add_argument("--resume", action="store_true",
                    help="init from the saved student instead of the teacher")
    ap.add_argument("--init-from", default=None, metavar="MSGPACK",
                    help="student params to start from (e.g. the plain "
                    "distilled student, as the init of a QAT fine-tune)")
    ap.add_argument("--measure", action="store_true",
                    help="after training, run the bench protocol on the student")
    ap.add_argument("--measure-only", action="store_true")
    # test/debug knobs (CPU smoke): tiny geometry + model
    ap.add_argument("--hw", type=int, nargs=2, default=None)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--teacher-blocks", type=int, default=16)
    ap.add_argument("--kernel-size", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--random-teacher", action="store_true",
                    help="PRNGKey(0) random teacher instead of the "
                    "committed trained demo checkpoint")
    ap.add_argument("--modular-teacher", action="store_true",
                    help="teacher targets from the modular flax apply "
                    "instead of the fused runner (CPU smoke: the runner's "
                    "Pallas kernels interpret-execute on CPU, minutes per "
                    "step; production runs keep the runner teacher)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from flax import serialization

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.train import make_optimizer  # noqa: F401
    from video_cycle_gan_upscaling_tpu.train.distill import (
        make_distill_step,
        make_eval_psnr,
        student_params_from_teacher,
    )
    from video_cycle_gan_upscaling_tpu.train.state import TrainState

    f = args.factor
    hw = tuple(args.hw) if args.hw else ((540, 960) if f == 2 else (270, 480))
    out_path = args.out or os.path.join(
        REPO, "assets", "students", f"x{f}_k{args.blocks}.msgpack")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    log(f"devices: {jax.devices()}  geometry {hw} x{f} "
        f"student K={args.blocks}")

    # --- teacher: the exact bench model ---------------------------------
    # default = the committed TRAINED demo checkpoint (what bench.py now
    # measures; utils/demo_assets.py); random init for CPU smokes and
    # ablations
    teacher = UpscalerOrig(kernel_size=args.kernel_size,
                           filters=args.filters, upscale_factor=f,
                           res_block_num=args.teacher_blocks,
                           dtype=jnp.bfloat16, phase_tail=True)
    t_params = None
    if not args.random_teacher and args.hw is None and args.filters == 64 \
            and args.teacher_blocks == 16 and args.kernel_size == 5:
        from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
            load_demo_generator_params,
        )

        t_params = load_demo_generator_params(f)
        if t_params is not None:
            log("teacher: TRAINED demo checkpoint")
    if t_params is None:
        log("teacher: PRNGKey(0) random init")
        t_params = teacher.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, *hw, 3), jnp.float32))["params"]
    t_runner = FastOrigRunner(t_params, res_block_num=args.teacher_blocks,
                              upscale_factor=f, tile_hw=hw, quant=False)
    if args.modular_teacher:
        tqp = jax.device_put(t_params)
        teacher_fwd = lambda tp, x: teacher.apply({"params": tp}, x,
                                                  return_trunk=True)
    else:
        tqp = jax.device_put(t_runner.qp)
        teacher_fwd = teacher_runner_forward(t_runner)

    # --- student ---------------------------------------------------------
    student = UpscalerOrig(kernel_size=args.kernel_size,
                           filters=args.filters, upscale_factor=f,
                           res_block_num=args.blocks, dtype=jnp.bfloat16,
                           phase_tail=False, trunk_pack=True, head_block=4)
    s_params = student_params_from_teacher(t_params, args.blocks,
                                           args.teacher_blocks)
    meta_path = out_path.replace(".msgpack", ".json")
    if args.init_from and not args.measure_only:
        with open(args.init_from, "rb") as fh:
            s_params = serialization.from_bytes(
                jax.device_get(s_params), fh.read())
        log(f"initialized student from {args.init_from}")
    if (args.resume or args.measure_only) and os.path.exists(out_path):
        with open(out_path, "rb") as fh:
            s_params = serialization.from_bytes(
                jax.device_get(s_params), fh.read())
        log(f"loaded student from {out_path}")

    if not args.measure_only:
        import optax

        from video_cycle_gan_upscaling_tpu.models.fast_infer import (
            parse_mix_spec,
        )
        from video_cycle_gan_upscaling_tpu.train.distill import (
            make_walk_distill_step,
            qat_calibrate,
        )

        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.peak_lr, min(100, args.steps // 10), args.steps,
            args.peak_lr * 0.02)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
        state = TrainState.create(apply_fn=student.apply,
                                  params=jax.device_put(s_params), tx=tx)
        qset, scales, tail_fq = frozenset(), None, None
        if args.qat or args.qat_tail:
            from PIL import Image

            cal_img = Image.open(os.path.join(
                DEMO, "input_480x270.png")).convert("RGB").resize(
                    (hw[1], hw[0]), Image.BICUBIC)
            cal = jnp.asarray(_to_unit(cal_img))[None]
        if args.qat:
            qset = parse_mix_spec(f"mix:{args.qat}", args.blocks)
            scales = qat_calibrate(jax.device_put(s_params), cal,
                                   args.blocks, qset)
            log(f"QAT units {sorted(qset)} (scales frozen from demo-frame "
                f"calibration)")
        if args.qat_tail:
            from video_cycle_gan_upscaling_tpu.train.distill import (
                qat_calibrate_tail,
            )

            tail_fq = qat_calibrate_tail(jax.device_put(s_params), cal,
                                         args.blocks, f)
            log(f"tail QAT on ({sorted(tail_fq)} scales frozen)")
        step = make_walk_distill_step(
            args.blocks, args.teacher_blocks, f, hw, batch=args.batch,
            qset=qset, scales=scales, tail_fq=tail_fq,
            hint_weight=args.hint_weight,
            hint_decay_steps=args.hint_decay, synth_prob=args.synth_prob,
            feat_weight=args.feat_weight, seed=args.seed)
        t_params_d = jax.device_put(t_params)  # walker teacher (modular tree)
        pool_np, val_np = build_pools(hw)
        log(f"train pool {pool_np.shape}, val {val_np.shape}")
        # push as uint8 (codec-parity) — the tunnel's host->device link is
        # ~0.8 MB/s, f32 pools would stall for minutes (CLAUDE.md)
        to_dev_u8 = lambda a: jax.device_put(
            np.clip(np.round((a + 1) * 127.5), 0, 255).astype(np.uint8))
        u8_to_unit = jax.jit(
            lambda u: u.astype(jnp.float32) / 127.5 - 1.0)
        pool = u8_to_unit(to_dev_u8(pool_np))
        val = u8_to_unit(to_dev_u8(val_np))
        # teacher_fwd returns (out, feat); eval wants out only. Under
        # QAT the val metric (and therefore best-checkpoint selection)
        # runs the student's QUANT-SIM forward — the deploy-relevant
        # quantity.
        if qset or tail_fq is not None:
            from video_cycle_gan_upscaling_tpu.train.distill import (
                tail_walk,
                trunk_walk,
            )

            def stu_fwd(p, x):
                trunk, _ = trunk_walk(p, x, args.blocks, qset=qset,
                                      scales=scales)
                return tail_walk(p, trunk, f, fq_scales=tail_fq)

            ev = make_eval_psnr(stu_fwd,
                                lambda p, x: teacher_fwd(p, x)[0])
        else:
            ev = make_eval_psnr(student,
                                lambda p, x: teacher_fwd(p, x)[0])

        best = -1.0
        pend = None
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step(state, t_params_d, pool)
            if pend is not None and i % 50 == 0:
                log(f"step {i:5d}  loss {float(pend['loss']):.3e}  "
                    f"out {float(pend['loss_out']):.3e}  "
                    f"feat {float(pend['loss_feat']):.3e}  "
                    f"hint {float(pend.get('loss_hint', 0.0)):.3e}  "
                    f"psnr {float(pend['psnr']):.2f} dB  "
                    f"({(time.perf_counter() - t0):.0f}s)")
            pend = m
            if (i + 1) % args.eval_every == 0 or i + 1 == args.steps:
                vp = float(ev(state.params, tqp, val))
                tag = ""
                if vp > best:
                    best = vp
                    params_host = jax.device_get(state.params)
                    with open(out_path + ".tmp", "wb") as fh:
                        fh.write(serialization.to_bytes(params_host))
                    os.replace(out_path + ".tmp", out_path)
                    modes = (["int8", "tail8", "trunk"] if args.qat_tail
                             else ["trunk", "tail8", "bf16"])
                    with open(meta_path, "w") as fh:
                        json.dump({"factor": f, "blocks": args.blocks,
                                   "teacher_blocks": args.teacher_blocks,
                                   "filters": args.filters,
                                   "kernel_size": args.kernel_size,
                                   "geometry": list(hw),
                                   "val_psnr_vs_teacher_runner": vp,
                                   "val_is_quant_sim": bool(
                                       qset or tail_fq is not None),
                                   "qat": args.qat,
                                   "qat_tail": args.qat_tail,
                                   "modes": modes,
                                   "steps": i + 1,
                                   "feat_weight": args.feat_weight,
                                   "peak_lr": args.peak_lr}, fh, indent=1)
                    tag = "  [saved]"
                log(f"eval step {i + 1}: val PSNR vs teacher runner "
                    f"{vp:.2f} dB (best {best:.2f}){tag}")
        log(f"training done in {time.perf_counter() - t0:.0f}s; "
            f"best val {best:.2f} dB -> {out_path}")
        s_params = jax.device_get(state.params)
        if best >= 0 and os.path.exists(out_path):
            with open(out_path, "rb") as fh:
                s_params = serialization.from_bytes(s_params, fh.read())

    if not (args.measure or args.measure_only):
        return

    # --- bench-protocol measurement -------------------------------------
    from PIL import Image

    from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler

    def frame(name, interp):
        img = Image.open(os.path.join(DEMO, name)).convert("RGB")
        if img.size != (hw[1], hw[0]):
            img = img.resize((hw[1], hw[0]), interp)
        return jnp.asarray(_to_unit(img))

    cal = frame("input_480x270.png", Image.BICUBIC)
    evf = frame("eval_ukiyo_1080p.jpg", Image.LANCZOS)
    tqp_r = (jax.device_put(t_runner.qp) if args.modular_teacher else tqp)
    t_out = jax.jit(t_runner.apply)(tqp_r, evf[None])

    def _force(out):
        out = jax.lax.optimization_barrier(out)
        sl = out[tuple(slice(None, None, max(1, d // 4))
                       for d in out.shape)]
        return jnp.sum(sl.astype(jnp.float32))

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        return 10 * np.log10(4.0 / max(mse, 1e-12))

    # the bench's budget-derived gate (ADVICE r4: never duplicate the
    # constant — PASS/MISS rows here must mirror bench.py's decision)
    from bench import TURBO_PSNR_GATE

    gate = float(TURBO_PSNR_GATE)
    rows = []
    modes = ["bf16", "trunk", "tail", "tail8", "mix:last2", "mix:last4",
             True]
    if f == 4:
        modes.insert(4, "tail8:s1")  # bf16 stage-0 (round-5 s0 finding)
    for quant in modes:
        q = False if quant == "bf16" else quant
        r = FastOrigRunner(s_params, res_block_num=args.blocks,
                           upscale_factor=f, tile_hw=hw, quant=q)
        qp = jax.device_put(r.qp)
        if r.tail_quant_ready or r.quant:
            qp = r.calibrate(qp, cal[None])
        s_out = jax.jit(r.apply)(qp, evf[None])
        p = psnr(s_out, t_out)
        up = make_tiled_upscaler(r.apply, hw, hw, 16, f,
                                 apply_fn_u8=r.apply_u8)
        gen = jax.jit(lambda key: jax.random.randint(
            key, (16, 8, *hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))
        clip = gen(jax.random.PRNGKey(7))
        probe = jax.jit(lambda p_, c: _force(up.clip_u8(p_, c)))
        float(probe(qp, clip))
        t1 = time.perf_counter()
        for _ in range(4):
            float(probe(qp, clip))
        fps = 16 * 8 / ((time.perf_counter() - t1) / 4)
        ok = "PASS" if p >= gate else "MISS"
        rows.append((str(quant), fps, p, ok))
        log(f"student K={args.blocks} x{f} {quant}: {fps:.2f} fps, "
            f"{p:.2f} dB vs TEACHER bf16 [{ok} gate {gate}]")
    best_ok = max((r for r in rows if r[3] == "PASS"),
                  key=lambda r: r[1], default=None)
    log(f"frontier best compliant: {best_ok}")


if __name__ == "__main__":
    main()
