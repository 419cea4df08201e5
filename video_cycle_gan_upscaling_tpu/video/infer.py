"""Clip inference pipeline: frame source -> tiled upscale -> sink.

BASELINE config 4 end-to-end: decode (host) overlaps with TPU compute via
a prefetch queue; one fixed-shape compiled graph per frame geometry.
Returns throughput so bench.py and the CLI share one code path.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from video_cycle_gan_upscaling_tpu.data.pipeline import prefetch_to_device
from video_cycle_gan_upscaling_tpu.video.tiles import make_tiled_upscaler


def upscale_clip_stream(apply_fn: Callable, params, source, sink=None,
                        frame_hw: Tuple[int, int] = (540, 960),
                        tile_hw: Tuple[int, int] = (540, 960),
                        overlap: int = 16, upscale_factor: int = 2,
                        max_frames: Optional[int] = None,
                        chunk_frames: int = 8,
                        chunks_per_dispatch: int = 16,
                        apply_fn_u8: Callable = None) -> dict:
    """Streaming clip upscale — the headline-speed product path.

    The per-frame loop below (``upscale_clip``) pays one dispatch + one
    f32 host->device push per frame; on the tunneled TPU platform that is
    a ~29 ms RPC floor each way. This path instead feeds the SAME
    lax.scan-over-chunks graph the benchmark measures
    (video/tiles.py upscale_clip_u8): decode -> uint8 host->device (4x
    less tunnel traffic than f32) -> one dispatch per
    ``chunks_per_dispatch`` x ``chunk_frames`` frames -> uint8 out, with
    a one-deep pipeline so the host decodes superbatch k+1 and drains
    k-1 while the device computes k. Replaces the reference's per-frame
    ``predict`` loop (upscaler_mini_testing.ipynb cell 18).

    A short final superbatch is padded by repeating its last frame (the
    padded outputs are dropped before the sink). fps excludes the first
    (compile/warmup) superbatch; with a single superbatch fps is 0.0.
    """
    from video_cycle_gan_upscaling_tpu.video.io import (
        iter_frames_uint8,
        write_frame_uint8,
    )

    upscale = make_tiled_upscaler(apply_fn, frame_hw, tile_hw, overlap,
                                  upscale_factor, apply_fn_u8=apply_fn_u8)
    k, f = chunks_per_dispatch, chunk_frames
    run = jax.jit(upscale.clip_u8)

    n_in = 0
    n_out = 0
    first_out = None
    t0 = None
    timed = 0
    pending = None  # (device uint8 [K,F,H',W',3], real frame count)
    groups = 0

    def emit(pend):
        nonlocal first_out, n_out
        if pend is None:
            return
        out, real = pend
        host = np.asarray(out).reshape(-1, *out.shape[2:])[:real]
        if first_out is None and len(host):
            first_out = host[0]
        if sink is not None:
            for fr in host:
                write_frame_uint8(sink, fr)
        n_out += len(host)

    def dispatch(frames, real):
        nonlocal pending, groups, t0, timed
        while len(frames) < k * f:  # pad short tail superbatch
            frames.append(frames[-1])
        clip = np.stack(frames).reshape(k, f, *frames[0].shape)
        out = run(params, clip)
        if groups == 0:
            # warmup: complete compute AND the device->host fetch outside
            # the timed window (the host round-trip is the only reliable
            # completion barrier on the tunneled platform)
            emit((out, real))
            t0 = time.perf_counter()
        else:
            emit(pending)  # previous superbatch's fetch overlaps this compute
            pending = (out, real)
            timed += real
        groups += 1

    buf = []
    for i, frame in enumerate(iter_frames_uint8(source)):
        if max_frames is not None and i >= max_frames:
            break
        buf.append(np.ascontiguousarray(frame, np.uint8))
        n_in += 1
        if len(buf) == k * f:
            dispatch(buf, k * f)
            buf = []
    if buf:
        dispatch(buf, len(buf))
    emit(pending)
    seconds = (time.perf_counter() - t0) if (t0 is not None and timed) else 0.0
    if sink is not None and hasattr(sink, "close"):
        sink.close()
    return {
        "frames": n_in,
        "seconds": seconds,
        "fps": (timed / seconds) if seconds > 0 else 0.0,
        # uint8 frame (codec-parity output format of the streaming graph)
        "first_frame": first_out,
    }


def upscale_clip(apply_fn: Callable, params, source, sink=None,
                 frame_hw: Tuple[int, int] = (540, 960),
                 tile_hw: Tuple[int, int] = (135, 240),
                 overlap: int = 16, upscale_factor: int = 4,
                 max_frames: Optional[int] = None,
                 warmup: int = 1, mesh=None) -> dict:
    """Upscale every frame from ``source``; write to ``sink`` if given.

    ``mesh``: optional 1-D jax.sharding.Mesh — frames are then processed
    in device-count groups, batch-sharded over the mesh with replicated
    params (pure data parallelism; InstanceNorm statistics are per-frame,
    so sharded results are identical to the single-device path). Scale-out
    for the BASELINE "frames/sec/chip on v5e-8" target.

    Returns {'frames', 'seconds', 'fps', 'first_frame'} — fps excludes the
    compile/warmup frame(s).
    """
    upscale = make_tiled_upscaler(apply_fn, frame_hw, tile_hw, overlap,
                                  upscale_factor)
    if mesh is not None:
        return _upscale_clip_dp(upscale, params, source, sink, mesh,
                                max_frames, warmup)

    def frames():
        for i, frame in enumerate(source):
            if max_frames is not None and i >= max_frames:
                return
            yield np.ascontiguousarray(frame, np.float32)

    n = 0
    first_out = None
    t0 = time.perf_counter() if warmup == 0 else None
    pending = None
    for frame in prefetch_to_device(frames(), size=4):
        out = upscale(params, frame)
        if n < warmup:
            # complete the warmup frame fully — device compute AND the
            # device->host fetch — OUTSIDE the timed window: the host
            # round-trip is the only reliable completion barrier on the
            # tunneled platform (block_until_ready is not; CLAUDE.md)
            host = np.asarray(out)
            if first_out is None:
                first_out = host
            if sink is not None:
                sink.write(host)
            n += 1
            t0 = time.perf_counter()
            continue
        if pending is not None:
            host = np.asarray(pending)
            if first_out is None:
                first_out = host
            if sink is not None:
                sink.write(host)
        pending = out
        n += 1
    if pending is not None:
        host = np.asarray(pending)
        if first_out is None:
            first_out = host
        if sink is not None:
            sink.write(host)
    timed = max(n - warmup, 0)
    # close the window once the last frame reaches the host, before any
    # sink flush/close cost
    seconds = (time.perf_counter() - t0) if (t0 is not None and timed) else 0.0
    if sink is not None and hasattr(sink, "close"):
        sink.close()
    return {
        "frames": n,
        "seconds": seconds,
        # 0.0 (not NaN) when nothing was timed: NaN is invalid strict JSON
        # and the upscale CLI json.dumps's this dict
        "fps": (timed / seconds) if seconds > 0 else 0.0,
        "first_frame": first_out,
    }


def _upscale_clip_dp(upscale, params, source, sink, mesh, max_frames,
                     warmup) -> dict:
    """Data-parallel clip loop: frames grouped per device count, batch
    axis sharded over the mesh, params replicated (ICI-free — no
    collectives in the forward graph at all). A short final group is
    padded by repeating its last frame; the padding outputs are dropped
    before the sink."""
    from video_cycle_gan_upscaling_tpu.parallel.mesh import (
        batch_sharding,
        replicated,
    )

    n_dev = int(np.prod(mesh.devices.shape))
    bsh = batch_sharding(mesh)
    params = jax.device_put(params, replicated(mesh))
    batched = jax.jit(upscale.batch, in_shardings=(replicated(mesh), bsh),
                      out_shardings=bsh)

    n = 0
    groups = 0
    timed_frames = 0
    first_out = None
    t0 = time.perf_counter() if warmup == 0 else None
    pending = None  # (device array, real frame count) — one-deep pipeline

    def drain():
        nonlocal first_out
        if pending is None:
            return
        out, k = pending
        host = np.asarray(out)[:k]
        if first_out is None:
            first_out = host[0]
        if sink is not None:
            for f in host:
                sink.write(f)

    def flush(buf):
        nonlocal n, groups, timed_frames, t0, pending, first_out
        k = len(buf)
        if k == 0:
            return
        while len(buf) < n_dev:  # pad short tail group
            buf.append(buf[-1])
        x = jax.device_put(np.stack(buf).astype(np.float32), bsh)
        out = batched(params, x)
        if groups < warmup:
            # complete warmup fully (compute AND device->host) outside
            # the timed window — the host fetch is the only reliable
            # completion barrier on the tunneled platform
            host = np.asarray(out)[:k]
            if first_out is None:
                first_out = host[0]
            if sink is not None:
                for f in host:
                    sink.write(f)
            t0 = time.perf_counter()
        else:
            drain()  # previous group's fetch overlaps this group's compute
            pending = (out, k)
            timed_frames += k  # real frames only; padding excluded
        n += k
        groups += 1

    buf = []
    for i, frame in enumerate(source):
        if max_frames is not None and i >= max_frames:
            break
        buf.append(np.ascontiguousarray(frame, np.float32))
        if len(buf) == n_dev:
            flush(buf)
            buf = []
    flush(buf)
    drain()
    seconds = (time.perf_counter() - t0) if (t0 is not None
                                             and timed_frames) else 0.0
    if sink is not None and hasattr(sink, "close"):
        sink.close()

    fps = (timed_frames / seconds) if seconds > 0 else 0.0
    return {"frames": n, "seconds": seconds, "fps": fps,
            "first_frame": first_out}
