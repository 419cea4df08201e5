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
    sync_metrics: bool = False,
):
    """Run ``number_of_batches`` updates; returns (final_state, last_row).

    ``step_fn(state, *batch) -> (state, metrics)``; ``batches`` yields
    tuples fed to the step. ``on_save(state, batch_idx)`` renders sample
    images at checkpoint time (train.py:265-266 analog).

    The metric fetch is PIPELINED one step behind the dispatch: step
    ``b+1`` is enqueued before step ``b``'s metrics cross the
    device->host link, so the fetch latency overlaps the next step's
    device execution instead of serializing with it. On the tunneled
    TPU platform this is the difference between 64.3 and 36.4 ms/step
    at the bench config (scripts/pipeline_probe.py — the per-fetch RPC
    floor is ~29 ms against a ~34 ms on-device step); on directly
    attached hardware it hides the smaller dispatch+fetch latency the
    same way. Logging rows, EWMA updates, and save DECISIONS are
    unchanged (every step's metrics are still processed, in order).
    PERIODIC checkpoints stay exact — save steps are known in advance,
    so the loop flushes the pending fetch before dispatching the next
    step there (one sync point per ``model_save_freq`` steps; the
    checkpoint labeled batch ``b`` holds the post-step-``b`` state the
    resume arithmetic depends on). The one observable skew: a BEST-EWMA
    snapshot triggered by step ``b``'s metrics captures the state after
    step ``b+1`` — one extra update on a quality-tracking overwrite
    (reference analog train.py:228-250), immaterial and documented.
    ``sync_metrics=True`` restores the exact fetch-every-step loop.
    """
    ewmas: Dict[str, Ewma] = {}
    best_loss = np.inf
    it = iter(batches)
    steps = range(number_of_batches)
    if prog_func is not None:
        steps = prog_func(steps)

    row: Dict[str, float] = {}
    start = time.perf_counter()

    def process(b, metrics):
        nonlocal best_loss, row
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

    pending = None
    for b in steps:
        batch = next(it)
        if pending is not None and pending[0] % model_save_freq == 0:
            # exact-state save point: flush BEFORE the next dispatch so
            # the periodic checkpoint snapshots the post-step state
            process(pending[0], jax.device_get(pending[1]))
            pending = None
        state, metrics = step_fn(state, *batch)
        if sync_metrics:
            process(b, jax.device_get(metrics))
        else:
            if pending is not None:
                process(pending[0], jax.device_get(pending[1]))
            pending = (b, metrics)
    if pending is not None:
        process(pending[0], jax.device_get(pending[1]))

    return state, row
