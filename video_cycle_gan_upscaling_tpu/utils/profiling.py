"""Profiling / tracing hooks (SURVEY.md §5.1 rebuild note).

The reference's only profiling artifact is a dead tf.RunOptions config
(train_gan2.py:23) and tqdm bars. Here: jax.profiler trace capture around
training windows plus a lightweight step timer producing
steps/sec / frames/sec summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vcgu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self._t0: Optional[float] = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def timed_steps(self) -> int:
        return max(self.count - self.warmup, 0)

    @property
    def seconds(self) -> float:
        if self._t0 is None or self.timed_steps == 0:
            return 0.0
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        return self.timed_steps / self.seconds if self.seconds > 0 else float("nan")

    def summary(self, items_per_step: float = 1.0) -> dict:
        sps = self.steps_per_sec
        return {
            "steps": self.timed_steps,
            "seconds": self.seconds,
            "steps_per_sec": sps,
            "items_per_sec": sps * items_per_step,
        }


def device_op_table(log_dir: str = "/tmp/vcgu_trace",
                    iters: int = 1) -> list:
    """Aggregate a captured trace's DEVICE-side XLA op events into a
    per-op time table (descending total time).

    The round-3 discovery behind this helper: jax.profiler traces DO
    carry device op events through the tunneled axon platform, so
    per-op attribution works where wall-clock ablation can't (see
    docs/PERF.md round-3 decompositions). Returns a list of dicts with
    name / ms (per ``iters``) / hlo_category / model_flops /
    bytes_accessed / source. Raises RuntimeError when the trace holds no
    device-op events (e.g. a CPU-only run) instead of returning an empty
    table that reads as "0 ms everywhere".
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    # device pid: the process named like /device:TPU:*; ops live on the
    # 'XLA Ops' thread (tid discovered from metadata)
    dev_pids = set()
    op_tids = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "M":
            continue
        if (e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))):
            dev_pids.add(e.get("pid"))
        if (e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_tids[e.get("pid")] = e.get("tid")
    agg: dict = collections.defaultdict(
        lambda: {"ms": 0.0, "hlo_category": "?", "model_flops": 0,
                 "bytes_accessed": 0, "source": "?"})
    for e in data.get("traceEvents", []):
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("tid") == op_tids.get(e.get("pid"))):
            a = e.get("args", {})
            row = agg[e["name"]]
            row["ms"] += e.get("dur", 0) / 1e3 / iters
            row["hlo_category"] = a.get("hlo_category", row["hlo_category"])
            row["model_flops"] = int(a.get("model_flops", 0) or 0)
            row["bytes_accessed"] = int(
                a.get("bytes_accessed", a.get("bytes accessed", 0)) or 0)
            row["source"] = a.get("source", row["source"])
    if not agg:
        raise RuntimeError(
            f"trace {paths[-1]} contains no device-op events (device pids "
            f"{sorted(dev_pids)}, op tids {op_tids}) — was the traced code "
            f"actually dispatched to a device?")
    out = [{"name": k, **v} for k, v in agg.items()]
    out.sort(key=lambda r: -r["ms"])
    return out
