"""Clip/frame upscaling CLI (BASELINE config 4).

Replaces the reference's notebook inference path (load .h5 ->
layers.pop(0) re-instantiation -> per-frame predict,
upscaler_mini_testing.ipynb cells 5-18) with: restore checkpoint ->
fixed-shape tiled inference -> blended frames -> sink. Reads the run's
parameters.json to rebuild the generator.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from video_cycle_gan_upscaling_tpu.models import make_generator
from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
from video_cycle_gan_upscaling_tpu.utils.config import RunConfig
from video_cycle_gan_upscaling_tpu.video.infer import (
    upscale_clip,
    upscale_clip_stream,
)
from video_cycle_gan_upscaling_tpu.video.io import open_sink, open_source


def _load_student(spec, factor_hint=None):
    """Resolve a distilled-student asset (scripts/distill_student.py,
    train/distill.py) into (meta, params).

    ``spec``: a path to the asset (``assets/students/x2_k8`` stem,
    ``.json`` or ``.msgpack``), or ``auto`` — pick the committed asset
    whose metadata records a shipping mode (``ship_mode``: the mode that
    passed the bench's budget-derived quality gate), preferring the
    highest recorded ``ship_fps``. The asset is self-contained (params +
    blocks + factor + trained geometry), so no run dir is needed — the
    product analog of the reference's checkpoint-driven inference
    notebook (upscaler_mini_testing.ipynb cell 5)."""
    import glob

    from flax import serialization

    root = os.environ.get("VCGU_STUDENT_ROOT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "students")
    if spec == "auto":
        pat = (f"x{factor_hint}_*.json" if factor_hint else "x*_*.json")
        cands = []
        for mp in sorted(glob.glob(os.path.join(root, pat))):
            with open(mp) as fh:
                meta = json.load(fh)
            if meta.get("ship_mode"):
                cands.append((meta.get("ship_fps", 0.0), mp, meta))
        if not cands:
            raise SystemExit(
                f"--student auto: no asset under {root} records a "
                f"ship_mode (none passed the quality gate)")
        _, mp, meta = max(cands, key=lambda t: t[0])
    else:
        stem = spec
        for suf in (".json", ".msgpack"):
            if stem.endswith(suf):
                stem = stem[: -len(suf)]
        mp = stem + ".json"
        if not os.path.exists(mp) and os.path.exists(
                os.path.join(root, os.path.basename(mp))):
            mp = os.path.join(root, os.path.basename(mp))
        with open(mp) as fh:
            meta = json.load(fh)
    with open(mp[:-5] + ".msgpack", "rb") as fh:
        params = serialization.msgpack_restore(fh.read())
    return meta, params, mp[:-5]


def main(argv=None):
    p = argparse.ArgumentParser(description="Tiled clip upscaler")
    p.add_argument("-r", "--run-dir", default=None,
                   help="losses/<subdir>/<prefix> dir containing "
                        "parameters.json (not needed with --student)")
    p.add_argument("-c", "--checkpoint-dir", default=None,
                   help="trained_model/<subdir>/<prefix> dir (default: derived)")
    p.add_argument("--best", action="store_true", help="Use the 'best' slot")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("-i", "--input", required=True,
                   help="Frame source: image dir, .y4m, or container (ffmpeg)")
    p.add_argument("-o", "--output", default=None,
                   help="Sink: dir, .y4m, or container (ffmpeg)")
    p.add_argument("--student", default=None, metavar="PATH|auto",
                   help="Run a distilled-student asset instead of a "
                        "checkpoint: a stem/path under assets/students "
                        "(e.g. assets/students/x2_k8) or 'auto' to pick "
                        "the fastest asset whose metadata records a "
                        "gate-passing ship_mode. Self-contained — no "
                        "run dir needed")
    p.add_argument("--student-mode", default=None,
                   choices=("bf16", "trunk", "tail8", "tail8:s1", "i8tail",
                            "int8"),
                   help="Quantization mode for --student (default: the "
                        "asset's recorded ship_mode, else bf16)")
    p.add_argument("--factor", type=int, default=None,
                   help="With --student auto: restrict to x2/x4 assets")
    p.add_argument("--frame-height", type=int, default=None)
    p.add_argument("--frame-width", type=int, default=None)
    p.add_argument("--tile-height", type=int, default=None)
    p.add_argument("--tile-width", type=int, default=None)
    p.add_argument("--overlap", type=int, default=16)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--ext", default=".jpg")
    p.add_argument("--turbo", action="store_true",
                   help="W8A8 int8 trunk+tail (orig generator only; "
                        "lossy — see docs/PERF.md)")
    p.add_argument("--turbo-tail", action="store_true",
                   help="bf16 trunk + W8A8 up conv + bf16 head (hybrid "
                        "tail): the conservative budget mode (orig "
                        "generator only)")
    p.add_argument("--turbo-tail8", action="store_true",
                   help="bf16 trunk + all-W8A8 tail (head included): "
                        "faster than --turbo-tail, quantizes the head "
                        "(orig generator only)")
    p.add_argument("--turbo-trunk", default=None, metavar="SPEC",
                   nargs="?", const="all",
                   help="W8A8 trunk + BF16 tail: the budget mode for "
                        "TRAINED weights, whose tail dominates W8A8 "
                        "error (docs/PERF.md round 4). Optional SPEC "
                        "names the int8 units ('last8', '3,4'); default "
                        "all (orig generator only)")
    p.add_argument("--turbo-s1", action="store_true",
                   help="x4 chains: BF16 stage-0 up conv + W8A8 stage-1 "
                        "and head ('tail8:s1') — on trained weights the "
                        "whole tail8 deficit is the trunk-output (s0) "
                        "int8 representation, and stage 0 runs at LR "
                        "(orig generator only)")
    p.add_argument("--turbo-mix", default=None, metavar="SPEC",
                   help="all-W8A8 tail + MIXED-precision trunk: SPEC "
                        "names the int8 trunk units, e.g. 'last11', "
                        "'first8', or '3,4,16' (res blocks 0-15, 16 = "
                        "prefinal conv; orig generator only — "
                        "fast_infer.parse_mix_spec). Append '+s1' for "
                        "the bf16 stage-0 variant (x4 chains), e.g. "
                        "'last14+s1' — the x4 bench headline mode")
    p.add_argument("--dp", type=int, default=None, metavar="N",
                   help="Data-parallel inference over the first N devices "
                        "(frames batch-sharded over a 1-D mesh, params "
                        "replicated)")
    p.add_argument("--no-stream", action="store_true",
                   help="Disable chunked streaming dispatch (fall back to "
                        "the per-frame loop)")
    p.add_argument("--chunk-frames", type=int, default=8,
                   help="Frames per device chunk in streaming mode")
    p.add_argument("--chunks-per-dispatch", type=int, default=16,
                   help="Chunks scanned inside one dispatch in streaming "
                        "mode")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    runner = None
    apply_fn_u8 = None
    if args.student:
        # distilled-student product path: the asset is self-contained
        # (VERDICT r4 item 4 — the bench headline must be reachable
        # through the product surface). Default geometry = the student's
        # TRAINED frame geometry (InstanceNorm statistics match
        # deployment), default tile = whole frame (the bench operating
        # point; overlap sweep docs/PERF.md round 2).
        meta, sparams, stu_stem = _load_student(args.student, args.factor)
        factor = int(meta["factor"])
        geom = tuple(meta.get("geometry") or (540, 960))
        frame_hw = (args.frame_height or geom[0],
                    args.frame_width or geom[1])
        tile_hw = (args.tile_height or frame_hw[0],
                   args.tile_width or frame_hw[1])
        mode = args.student_mode or meta.get("ship_mode") or "bf16"
        from video_cycle_gan_upscaling_tpu.models.fast_infer import (
            FastOrigRunner,
        )

        mode_map = {"bf16": False, "trunk": "trunk", "tail8": "tail8",
                    "tail8:s1": "tail8:s1", "i8tail": "tail", "int8": True}
        runner = FastOrigRunner(
            sparams, res_block_num=int(meta["blocks"]),
            upscale_factor=factor, tile_hw=tile_hw,
            quant=mode_map[mode],
            filters=meta.get("filters"))
        print(json.dumps({"student": os.path.basename(stu_stem),
                          "blocks": meta["blocks"], "mode": mode}),
              flush=True)
        params = runner.qp
        apply_fn = runner.apply
        apply_fn_u8 = runner.apply_u8
    else:
        if not args.run_dir:
            raise SystemExit("either -r/--run-dir or --student is required")
        cfg = RunConfig.load(os.path.join(args.run_dir, "parameters.json"))
        from video_cycle_gan_upscaling_tpu.cli.common import (
            reject_batch_norm_inference,
        )

        reject_batch_norm_inference(cfg)
        dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                 else jnp.float32)
        # fastest valid modular graph per family: phase_tail where the
        # family supports it (orig, skip-con — make_generator drops it
        # otherwise) and the S-blocked head everywhere (the
        # 3-output-lane final conv at HR runs at ~0.8-3% MFU;
        # head_block=4 lifts it to 48 lanes — same params, same map;
        # scripts/family_fps_sweep.py table in docs/PERF.md)
        model = make_generator(cfg.model, cfg.train.downscale_factor,
                               dtype=dtype, phase_tail=True, head_block=4)

        ckpt_dir = args.checkpoint_dir or cfg.run_dirs()["models"]
        ckpt = CheckpointManager(ckpt_dir)
        # structure-agnostic restore: works for GAN/CycleGAN checkpoints
        params = ckpt.restore_generator_params(
            family=cfg.family, best=args.best, step=args.step)

        frame_hw = (args.frame_height or 540, args.frame_width or 960)
        tile_hw = (args.tile_height or 135, args.tile_width or 240)
        factor = cfg.train.downscale_factor

        apply_fn = lambda prm, x: model.apply({"params": prm}, x)
        if ((args.turbo or args.turbo_tail or args.turbo_tail8
             or args.turbo_mix or args.turbo_trunk or args.turbo_s1)
                and cfg.model.generator != "orig"):
            raise SystemExit(
                "--turbo/--turbo-tail/--turbo-tail8/--turbo-mix/"
                "--turbo-trunk/--turbo-s1 support the 'orig' generator only")
        quant_mode = (True if args.turbo else
                      f"mix:{args.turbo_mix}" if args.turbo_mix else
                      "tail8:s1" if args.turbo_s1 else
                      "tail8" if args.turbo_tail8 else
                      "tail" if args.turbo_tail else
                      ("trunk" if args.turbo_trunk == "all" else
                       f"trunk:{args.turbo_trunk}") if args.turbo_trunk else
                      False)
        if cfg.model.generator == "orig":
            # fused-kernel inference runner (Pallas conv+IN trunk,
            # prepacked phase tail; --turbo switches the trunk to W8A8)
            # — ~4x the modular path on TPU (docs/PERF.md round 2).
            # Falls back to the modular path for unsupported geometries.
            from video_cycle_gan_upscaling_tpu.models.fast_infer import (
                make_fast_orig,
            )

            runner = make_fast_orig(params, cfg.model, factor, tile_hw,
                                    quant=quant_mode, dtype=dtype)
            if runner is not None:
                params = runner.qp
                apply_fn = runner.apply
                apply_fn_u8 = runner.apply_u8
            elif args.turbo:
                from video_cycle_gan_upscaling_tpu.models.quantized import (
                    quantize_orig_params,
                    quantized_orig_apply,
                )

                params = quantize_orig_params(params,
                                              cfg.model.res_block_num)
                apply_fn = lambda prm, x: quantized_orig_apply(
                    prm, x, dtype=dtype)

    source = open_source(args.input, size_hw=frame_hw, ext=args.ext)
    sink = None
    if args.output:
        sink = open_sink(args.output,
                         (frame_hw[0] * factor, frame_hw[1] * factor),
                         ext=args.ext)

    if runner is not None and (runner.tail_quant_ready or runner.quant):
        # quantized modes need activation scales from a real frame:
        # int8 TAILS add per-channel scales, and trunk-only modes still
        # need the per-channel trunk weight refold (uncalibrated
        # trained-weights trunks run static scales into clipping —
        # measured 28 dB garbage, bench.py/docs/PERF.md round 4).
        # Calibrate on the first source frame, then reopen.
        first = next(iter(open_source(args.input, size_hw=frame_hw,
                                      ext=args.ext)), None)
        if first is not None:
            tile = np.ascontiguousarray(
                first[:tile_hw[0], :tile_hw[1]], np.float32)[None]
            # NOT jitted: calibrate refolds weights host-side
            params = runner.calibrate(
                jax.device_put(params), jnp.asarray(tile))

    mesh = None
    if args.dp:
        from video_cycle_gan_upscaling_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.dp)

    if mesh is None and not args.no_stream:
        # streaming chunked dispatch — the headline-speed path (uint8
        # host<->device, lax.scan over chunks; video/infer.py docstring).
        # Shrink the superbatch for short known-length clips so padding
        # never dominates.
        k, f = args.chunks_per_dispatch, args.chunk_frames
        n_known = args.max_frames
        if n_known is None and hasattr(source, "__len__"):
            n_known = len(source)
        if n_known is not None:
            f = max(1, min(f, n_known))
            k = max(1, min(k, -(-n_known // f)))
        result = upscale_clip_stream(
            apply_fn, params, source, sink,
            frame_hw=frame_hw, tile_hw=tile_hw,
            overlap=args.overlap, upscale_factor=factor,
            max_frames=args.max_frames, chunk_frames=f,
            chunks_per_dispatch=k, apply_fn_u8=apply_fn_u8)
    else:
        result = upscale_clip(
            apply_fn, params, source, sink,
            frame_hw=frame_hw, tile_hw=tile_hw,
            overlap=args.overlap, upscale_factor=factor,
            max_frames=args.max_frames, mesh=mesh)
    print(json.dumps({"frames": result["frames"], "fps": result["fps"]}))
    return result


if __name__ == "__main__":
    main()
