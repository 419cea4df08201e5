"""Overlapping-tile inference with raised-cosine blend reassembly.

The reference upscales whole frames by re-instantiating the FCN at frame
resolution (upscaler_mini_testing.ipynb cells 6-7 — one Keras graph per
frame size). TPU-native replacement (SURVEY.md §5.7, BASELINE config 4):
decompose any frame into a STATIC grid of fixed-shape tiles with halo
overlap, run one compiled generator graph over the tile batch, and blend
tiles back with raised-cosine windows. One XLA program serves every frame
size; tile shape stays MXU/VMEM-friendly.

Tile positions and blend windows are Python-level constants per
(frame, tile, overlap) config — zero retracing across frames of one size.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_positions(size: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, size) with ``tile``-sized windows and at
    least ``overlap`` shared pixels; final window aligned to the edge."""
    if tile >= size:
        return [0]
    stride = tile - overlap
    pos = list(range(0, size - tile, stride))
    pos.append(size - tile)
    return pos


def plan_tiles(frame_hw: Tuple[int, int], tile_hw: Tuple[int, int],
               overlap: int) -> List[Tuple[int, int]]:
    """Static (y, x) tile-start grid for a frame."""
    ys = _axis_positions(frame_hw[0], tile_hw[0], overlap)
    xs = _axis_positions(frame_hw[1], tile_hw[1], overlap)
    return [(y, x) for y in ys for x in xs]


def _axis_window(size: int, ramp: int, at_low_edge: bool, at_high_edge: bool) -> np.ndarray:
    """1-D raised-cosine ramp of width ``ramp`` at interior edges; flat 1.0
    at frame borders (so border pixels keep full weight)."""
    w = np.ones(size, dtype=np.float32)
    if ramp > 0:
        r = 0.5 - 0.5 * np.cos(np.pi * (np.arange(ramp) + 0.5) / ramp)
        if not at_low_edge:
            w[:ramp] = r
        if not at_high_edge:
            w[size - ramp:] = r[::-1]
    return w


def tile_windows(frame_hw: Tuple[int, int], tile_hw: Tuple[int, int],
                 overlap: int) -> Tuple[List[Tuple[int, int]], np.ndarray]:
    """(positions, windows[T, th, tw, 1]): per-tile blend windows. Ramps
    span the overlap; windows of overlapping raised-cosine ramps sum to ~1
    in interior overlaps and are renormalized exactly at merge time."""
    positions = plan_tiles(frame_hw, tile_hw, overlap)
    th, tw = tile_hw
    wins = []
    for (y, x) in positions:
        wy = _axis_window(th, overlap, y == 0, y + th == frame_hw[0])
        wx = _axis_window(tw, overlap, x == 0, x + tw == frame_hw[1])
        wins.append(np.outer(wy, wx)[..., None])
    return positions, np.stack(wins).astype(np.float32)


def split_tiles(frame: jax.Array, positions: Sequence[Tuple[int, int]],
                tile_hw: Tuple[int, int]) -> jax.Array:
    """[H,W,C] frame -> [T,th,tw,C] tile batch (static slices)."""
    th, tw = tile_hw
    return jnp.stack([frame[y:y + th, x:x + tw, :] for (y, x) in positions])


def merge_tiles(tiles: jax.Array, positions: Sequence[Tuple[int, int]],
                windows: jax.Array, frame_hw: Tuple[int, int]) -> jax.Array:
    """Weighted scatter-add of [T,th,tw,C] tiles into an [H,W,C] frame,
    then exact renormalization by the accumulated window weight."""
    th, tw = tiles.shape[1], tiles.shape[2]
    acc = jnp.zeros((*frame_hw, tiles.shape[-1]), jnp.float32)
    wacc = jnp.zeros((*frame_hw, 1), jnp.float32)
    for i, (y, x) in enumerate(positions):
        w = windows[i]
        acc = acc.at[y:y + th, x:x + tw, :].add(tiles[i].astype(jnp.float32) * w)
        wacc = wacc.at[y:y + th, x:x + tw, :].add(w)
    return acc / wacc


def make_tiled_upscaler(apply_fn: Callable, frame_hw: Tuple[int, int],
                        tile_hw: Tuple[int, int] = (135, 240),
                        overlap: int = 16, upscale_factor: int = 4,
                        tile_batch: int = 0,
                        apply_fn_u8: Callable = None) -> Callable:
    """Build jitted ``upscale(params, frame_lr[H,W,C]) -> frame_hr``.

    ``apply_fn(params, lr_batch) -> hr_batch`` is a generator forward
    (e.g. ``lambda p, x: model.apply({'params': p}, x)``). ``overlap``
    must cover the generator's effective receptive-field halo — the
    ≤0.1 dB PSNR budget is validated empirically in tests/bench.
    ``tile_batch``: process tiles in fixed chunks (0 = all at once).
    ``apply_fn_u8``: optional codec-uint8-emitting forward (e.g.
    FastOrigRunner.apply_u8) — used by the clip paths at single-tile
    geometry so no f32 HR tensor is ever materialized.
    """
    positions = plan_tiles(frame_hw, tile_hw, overlap)
    f = upscale_factor
    hr_positions = [(y * f, x * f) for (y, x) in positions]
    hr_tile = (tile_hw[0] * f, tile_hw[1] * f)
    hr_frame = (frame_hw[0] * f, frame_hw[1] * f)
    # HR windows at the scaled positions (edge flags are scale-invariant)
    hr_windows = []
    for (y, x) in hr_positions:
        wy = _axis_window(hr_tile[0], overlap * f, y == 0, y + hr_tile[0] == hr_frame[0])
        wx = _axis_window(hr_tile[1], overlap * f, x == 0, x + hr_tile[1] == hr_frame[1])
        hr_windows.append(np.outer(wy, wx)[..., None])
    hr_windows = jnp.asarray(np.stack(hr_windows).astype(np.float32))

    @jax.jit
    def upscale(params, frame_lr: jax.Array) -> jax.Array:
        tiles = split_tiles(frame_lr, positions, tile_hw)
        if tile_batch and tile_batch < tiles.shape[0]:
            n = tiles.shape[0]
            pad = (-n) % tile_batch
            tiles_p = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunks = tiles_p.reshape(-1, tile_batch, *tiles.shape[1:])
            out = jax.lax.map(lambda t: apply_fn(params, t), chunks)
            hr_tiles = out.reshape(-1, *out.shape[2:])[:n]
        else:
            hr_tiles = apply_fn(params, tiles)
        return merge_tiles(hr_tiles, hr_positions, hr_windows, hr_frame)

    # single whole-frame tile (the flagship 540p operating point,
    # docs/PERF.md overlap sweep): the blend windows are identically 1.0,
    # so skip split/merge entirely — merge_tiles would otherwise burn two
    # full-HR f32 passes (weighted scatter-add + renormalize) on a no-op
    single_tile = len(positions) == 1 and tuple(tile_hw) == tuple(frame_hw)

    @jax.jit
    def upscale_batch(params, frames_lr: jax.Array) -> jax.Array:
        """[F,H,W,C] -> [F,H*f,W*f,C]: tiles of all frames batched through
        one generator call (amortizes per-call overhead, feeds the MXU a
        bigger batch)."""
        if single_tile:
            return apply_fn(params, frames_lr)
        f_n = frames_lr.shape[0]
        tiles = jax.vmap(lambda fr: split_tiles(fr, positions, tile_hw))(frames_lr)
        flat = tiles.reshape(-1, *tiles.shape[2:])
        hr_flat = apply_fn(params, flat)
        hr_tiles = hr_flat.reshape(f_n, -1, *hr_flat.shape[1:])
        return jax.vmap(
            lambda t: merge_tiles(t, hr_positions, hr_windows, hr_frame))(hr_tiles)

    @jax.jit
    def upscale_clip(params, clip_lr: jax.Array) -> jax.Array:
        """[K,F,H,W,C] in [-1,1] -> uint8 [K,F,H*f,W*f,C]: scan
        ``upscale_batch`` over K frame-chunks inside ONE dispatch. For
        streaming video the clip is resident on device and per-dispatch
        host-sync overhead (a ~29 ms RPC floor on the tunneled TPU
        platform) amortizes over K*F frames instead of F. Chunks are
        emitted in the codec-parity uint8 frame format (ops/codec.py) —
        what a video encoder consumes — which also keeps the stacked
        output 4x smaller than f32 in HBM."""
        from video_cycle_gan_upscaling_tpu.ops.codec import unit_to_uint8

        def batch_u8(params, frames):
            if single_tile and apply_fn_u8 is not None:
                # uint8 emitted straight from the generator's head epilogue
                return apply_fn_u8(params, frames)
            return unit_to_uint8(upscale_batch(params, frames))

        def body(carry, frames):
            return carry, batch_u8(params, frames)

        _, out = jax.lax.scan(body, None, clip_lr)
        return out

    @jax.jit
    def upscale_clip_u8(params, clip_u8: jax.Array) -> jax.Array:
        """uint8 [K,F,H,W,C] -> uint8 [K,F,H*f,W*f,C]: ``upscale_clip``
        with the input ALSO in codec uint8, decoded to [-1,1] on device —
        the streaming product path (video/infer.py upscale_clip_stream):
        host->device tunnel traffic drops 4x vs f32 frames."""
        from video_cycle_gan_upscaling_tpu.ops.codec import (
            uint8_to_unit,
            unit_to_uint8,
        )

        def body(carry, frames_u8):
            x = uint8_to_unit(frames_u8)
            if single_tile and apply_fn_u8 is not None:
                return carry, apply_fn_u8(params, x)
            return carry, unit_to_uint8(upscale_batch(params, x))

        _, out = jax.lax.scan(body, None, clip_u8)
        return out

    def upscale_one(params, frame_lr):
        return upscale(params, frame_lr)

    upscale_one.batch = upscale_batch
    upscale_one.clip = upscale_clip
    upscale_one.clip_u8 = upscale_clip_u8
    return upscale_one
