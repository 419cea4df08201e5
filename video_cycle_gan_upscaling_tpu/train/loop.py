"""Generic training loop harness with the reference's artifact policy.

One loop serves every trainer family (the reference re-implements this
skeleton in seven scripts, SURVEY.md §2.2): fused jitted step + EWMA
smoothing + TSV logging + best/periodic checkpointing + sample dumps.
Policy parity (train.py:215-266):
- EWMA ``agg = 0.99*agg + 0.01*loss`` per metric,
- best checkpoint when the chosen aggregate improves after a warmup of
  ``model_save_freq`` batches (train.py:228),
- periodic checkpoint + sample dump every ``model_save_freq`` batches.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
from video_cycle_gan_upscaling_tpu.utils.logging import Ewma, LossLog, ProgressTracker


def run_training_loop(
    step_fn: Callable,
    state,
    batches: Iterable,
    number_of_batches: int,
    *,
    best_metric: str,
    ewma_rate: float = 0.01,
    model_save_freq: int = 500,
    loss_log: Optional[LossLog] = None,
    best_log: Optional[LossLog] = None,
    progress: Optional[ProgressTracker] = None,
    ckpt: Optional[CheckpointManager] = None,
    on_save: Optional[Callable] = None,
    prog_func=None,
):
    """Run ``number_of_batches`` updates; returns (final_state, last_row).

    ``step_fn(state, *batch) -> (state, metrics)``; ``batches`` yields
    tuples fed to the step. ``on_save(state, batch_idx)`` renders sample
    images at checkpoint time (train.py:265-266 analog).
    """
    ewmas: Dict[str, Ewma] = {}
    best_loss = np.inf
    it = iter(batches)
    steps = range(number_of_batches)
    if prog_func is not None:
        steps = prog_func(steps)

    row: Dict[str, float] = {}
    start = time.perf_counter()
    for b in steps:
        batch = next(it)
        state, metrics = step_fn(state, *batch)
        metrics = jax.device_get(metrics)

        row = {"batch": b}
        for k, v in metrics.items():
            v = float(v)
            row[k] = v
            agg = ewmas.setdefault(k, Ewma(ewma_rate)).update(v)
            row[f"agg_{k}"] = agg
        row["sec_per_batch"] = (time.perf_counter() - start) / (b + 1)
        if loss_log is not None:
            loss_log.append(row)

        agg_key = f"agg_{best_metric}"
        if b > model_save_freq and row[agg_key] < best_loss:
            best_loss = row[agg_key]
            if ckpt is not None:
                path = ckpt.save_best(state)
                if progress is not None:
                    progress.record_best({**row, "saved_state": path})
            if best_log is not None:
                best_log.append(row)

        if b % model_save_freq == 0:
            if ckpt is not None:
                path = ckpt.save(b, state)
                if progress is not None:
                    progress.record_saved({**row, "saved_state": path})
            if on_save is not None:
                on_save(state, b)

    return state, row
