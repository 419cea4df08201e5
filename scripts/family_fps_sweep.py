"""Measured inference fps for EVERY generator family (VERDICT r3 item 5).

Round 3 shipped fused-runner numbers only for `orig`; the reference's own
GAN default is resnet-att (/root/reference/upscaling/train_gan.py:42) and
its stored demo checkpoints are skip-con/orig families
(example_movie_frames/example_frame_test.ipynb cells 5-10). This sweep
gives every family a measured number on the modular path at both bench
geometries (x2 540p->1080p, x4 270p->1080p), with each family's fastest
valid graph options:

- phase_tail=True where the family supports it (orig, skip-con);
- head_block=4 everywhere it divides (the 3-output-lane final conv at HR
  runs at ~0.8-3% MFU; S-blocking lifts it to 3*S^2 lanes — the same
  fix the training graphs ship, generators._head_conv);
- conv_t is the subpixel d2s rewrite for ALL families already
  (blocks.ConvTransposeSubpixel), so no family pays XLA's input-dilation
  transpose-conv lowering.

Timing protocol matches bench.py's per-batch dispatch: jitted batch
forward, execution forced by a strided-sliver scalar fetch, ~29 ms RPC
floor included (same for every row — relative order is what the table is
for). Results table goes to docs/PERF.md.
"""

import argparse
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


def _force(out):
    out = jax.lax.optimization_barrier(out)
    sl = out[tuple(slice(None, None, max(1, d // 4)) for d in out.shape)]
    return jnp.sum(sl.astype(jnp.float32))


FAMILIES = ("orig", "skip-con", "resnet-att", "inc-resnet", "unetish",
            "unetish-add")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--factors", nargs="*", type=int, default=[2, 4])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--head-block", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from video_cycle_gan_upscaling_tpu.models import make_generator
    from video_cycle_gan_upscaling_tpu.utils.config import ModelConfig

    log(f"devices: {jax.devices()}")
    rows = []
    for f in args.factors:
        hw = (540, 960) if f == 2 else (270, 480)
        for fam in args.families:
            cfg = ModelConfig(generator=fam)
            phase = fam in ("orig", "skip-con")
            model = make_generator(cfg, f, dtype=jnp.bfloat16,
                                   phase_tail=phase,
                                   head_block=args.head_block)
            batch = args.batch
            fps = None
            while batch >= 1:
                try:
                    x0 = jnp.zeros((1, *hw, 3), jnp.float32)
                    params = model.init(jax.random.PRNGKey(0), x0)["params"]
                    n_par = sum(int(np.prod(p.shape)) for p in
                                jax.tree_util.tree_leaves(params))
                    gen = jax.jit(lambda key: jax.random.uniform(
                        key, (batch, *hw, 3), jnp.float32, -1, 1))
                    xb = gen(jax.random.PRNGKey(1))
                    probe = jax.jit(lambda p, x: _force(
                        model.apply({"params": p}, x)))
                    float(probe(params, xb))  # compile + warmup
                    t0 = time.perf_counter()
                    for _ in range(args.rounds):
                        float(probe(params, xb))
                    dt = (time.perf_counter() - t0) / args.rounds
                    fps = batch / dt
                    log(f"x{f} {fam:12s} b{batch}: {dt * 1e3 / batch:7.1f} "
                        f"ms/frame = {fps:6.2f} fps  "
                        f"(phase_tail={phase}, hb={args.head_block}, "
                        f"{n_par / 1e6:.2f}M params)")
                    break
                except Exception as e:
                    log(f"x{f} {fam} b{batch} failed "
                        f"({type(e).__name__}: {str(e)[:120]}); halving")
                    batch //= 2
            if fps is None:
                # whole-frame graph never compiled (the inc-resnet 540p
                # remote-compile crash, round-4): fall back to the tiled
                # product path — 4 tiles of 270x480 with overlap 32
                # (the <=0.1 dB operating point from the overlap sweep)
                try:
                    from video_cycle_gan_upscaling_tpu.video.tiles import (
                        make_tiled_upscaler,
                    )

                    batch = 2
                    x0 = jnp.zeros((1, hw[0] // 2, hw[1] // 2, 3),
                                   jnp.float32)
                    params = model.init(jax.random.PRNGKey(0), x0)["params"]
                    up = make_tiled_upscaler(
                        lambda p, x: model.apply({"params": p}, x), hw,
                        (hw[0] // 2, hw[1] // 2), 32, f)
                    xb = jax.jit(lambda key: jax.random.uniform(
                        key, (batch, *hw, 3), jnp.float32, -1, 1))(
                        jax.random.PRNGKey(1))
                    probe = jax.jit(lambda p, x: _force(up.batch(p, x)))
                    float(probe(params, xb))
                    t0 = time.perf_counter()
                    for _ in range(args.rounds):
                        float(probe(params, xb))
                    dt = (time.perf_counter() - t0) / args.rounds
                    fps = batch / dt
                    log(f"x{f} {fam:12s} b{batch} TILED 2x2/ov32: "
                        f"{dt * 1e3 / batch:7.1f} ms/frame = {fps:6.2f} fps")
                except Exception as e:
                    log(f"x{f} {fam} tiled fallback failed "
                        f"({type(e).__name__}: {str(e)[:120]})")
            rows.append((f, fam, batch, fps))

    log("\n| factor | family | batch | fps (modular path) |")
    log("|---|---|---|---|")
    for f, fam, b, fps in rows:
        val = f"{fps:.2f}" if fps else "failed"
        log(f"| x{f} | {fam} | {b} | {val} |")


if __name__ == "__main__":
    main()
