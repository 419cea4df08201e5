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


def main(argv=None):
    p = argparse.ArgumentParser(description="Tiled clip upscaler")
    p.add_argument("-r", "--run-dir", required=True,
                   help="losses/<subdir>/<prefix> dir containing parameters.json")
    p.add_argument("-c", "--checkpoint-dir", default=None,
                   help="trained_model/<subdir>/<prefix> dir (default: derived)")
    p.add_argument("--best", action="store_true", help="Use the 'best' slot")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("-i", "--input", required=True,
                   help="Frame source: image dir, .y4m, or container (ffmpeg)")
    p.add_argument("-o", "--output", default=None,
                   help="Sink: dir, .y4m, or container (ffmpeg)")
    p.add_argument("--frame-height", type=int, default=540)
    p.add_argument("--frame-width", type=int, default=960)
    p.add_argument("--tile-height", type=int, default=135)
    p.add_argument("--tile-width", type=int, default=240)
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
    p.add_argument("--turbo-mix", default=None, metavar="SPEC",
                   help="all-W8A8 tail + MIXED-precision trunk: SPEC "
                        "names the int8 trunk units, e.g. 'last11', "
                        "'first8', or '3,4,16' (res blocks 0-15, 16 = "
                        "prefinal conv; orig generator only — "
                        "fast_infer.parse_mix_spec)")
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

    cfg = RunConfig.load(os.path.join(args.run_dir, "parameters.json"))
    from video_cycle_gan_upscaling_tpu.cli.common import reject_batch_norm_inference

    reject_batch_norm_inference(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    # fastest valid modular graph per family: phase_tail where the family
    # supports it (orig, skip-con — make_generator drops it otherwise) and
    # the S-blocked head everywhere (the 3-output-lane final conv at HR
    # runs at ~0.8-3% MFU; head_block=4 lifts it to 48 lanes — same
    # params, same map; scripts/family_fps_sweep.py table in docs/PERF.md)
    model = make_generator(cfg.model, cfg.train.downscale_factor, dtype=dtype,
                           phase_tail=True, head_block=4)

    ckpt_dir = args.checkpoint_dir or cfg.run_dirs()["models"]
    ckpt = CheckpointManager(ckpt_dir)
    # structure-agnostic restore: works for GAN/CycleGAN checkpoints too
    params = ckpt.restore_generator_params(
        family=cfg.family, best=args.best, step=args.step)

    frame_hw = (args.frame_height, args.frame_width)
    source = open_source(args.input, size_hw=frame_hw, ext=args.ext)
    factor = cfg.train.downscale_factor
    sink = None
    if args.output:
        sink = open_sink(args.output,
                         (frame_hw[0] * factor, frame_hw[1] * factor),
                         ext=args.ext)

    apply_fn = lambda prm, x: model.apply({"params": prm}, x)
    apply_fn_u8 = None
    if ((args.turbo or args.turbo_tail or args.turbo_tail8 or args.turbo_mix
         or args.turbo_trunk) and cfg.model.generator != "orig"):
        raise SystemExit("--turbo/--turbo-tail/--turbo-tail8/--turbo-mix/"
                         "--turbo-trunk support the 'orig' generator only")
    quant_mode = (True if args.turbo else
                  f"mix:{args.turbo_mix}" if args.turbo_mix else
                  "tail8" if args.turbo_tail8 else
                  "tail" if args.turbo_tail else
                  ("trunk" if args.turbo_trunk == "all" else
                   f"trunk:{args.turbo_trunk}") if args.turbo_trunk else
                  False)
    if cfg.model.generator == "orig":
        # fused-kernel inference runner (Pallas conv+IN trunk, prepacked
        # phase tail; --turbo switches the trunk to W8A8) — ~4x the
        # modular path on TPU (docs/PERF.md round 2). Falls back to the
        # modular path for unsupported tile geometries.
        from video_cycle_gan_upscaling_tpu.models.fast_infer import make_fast_orig

        runner = make_fast_orig(params, cfg.model, factor,
                                (args.tile_height, args.tile_width),
                                quant=quant_mode, dtype=dtype)
        if runner is not None:
            params = runner.qp
            apply_fn = runner.apply
            apply_fn_u8 = runner.apply_u8
            if runner.tail_quant_ready:
                # int8 tail needs activation scales from a real frame:
                # calibrate on the first source frame, then reopen
                first = next(iter(open_source(args.input, size_hw=frame_hw,
                                              ext=args.ext)), None)
                if first is not None:
                    tile = np.ascontiguousarray(
                        first[:args.tile_height, :args.tile_width],
                        np.float32)[None]
                    # NOT jitted: calibrate refolds weights host-side
                    params = runner.calibrate(
                        jax.device_put(params), jnp.asarray(tile))
        elif args.turbo:
            from video_cycle_gan_upscaling_tpu.models.quantized import (
                quantize_orig_params,
                quantized_orig_apply,
            )

            params = quantize_orig_params(params, cfg.model.res_block_num)
            apply_fn = lambda prm, x: quantized_orig_apply(prm, x, dtype=dtype)

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
            frame_hw=frame_hw, tile_hw=(args.tile_height, args.tile_width),
            overlap=args.overlap, upscale_factor=factor,
            max_frames=args.max_frames, chunk_frames=f,
            chunks_per_dispatch=k, apply_fn_u8=apply_fn_u8)
    else:
        result = upscale_clip(
            apply_fn, params, source, sink,
            frame_hw=frame_hw, tile_hw=(args.tile_height, args.tile_width),
            overlap=args.overlap, upscale_factor=factor,
            max_frames=args.max_frames, mesh=mesh)
    print(json.dumps({"frames": result["frames"], "fps": result["fps"]}))
    return result


if __name__ == "__main__":
    main()
