"""Run observability: EWMA smoothing, TSV loss logs, progress.json.

Artifact parity with the reference (SURVEY.md §5.5): append-only TSV with
header + one row per batch (train.py:202-206, 224-225), a separate
``*_best.txt`` on new-best events (train.py:233-234), EWMA smoothing
``agg = (1-r)*agg + r*loss`` with r=0.01 (train.py:184-185), and a
progress.json carrying the best-model record + saved-model table
(train.py:188-199, 236-245). Writers are buffered append-only file ops on
the host thread — cheap next to a TPU step — and flushed per write so a
crash loses at most one row.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional

from video_cycle_gan_upscaling_tpu.utils.json_codec import ArtifactEncoder


class Ewma:
    """agg = (1 - rate) * agg + rate * x, starting at 0 (train.py:181-185)."""

    def __init__(self, rate: float = 0.01):
        self.rate = rate
        self.value = 0.0

    def update(self, x: float) -> float:
        self.value = (1.0 - self.rate) * self.value + self.rate * float(x)
        return self.value


class LossLog:
    """TSV loss log: header row, tab-separated float rows."""

    def __init__(self, path: str, columns: Iterable[str]):
        self.path = path
        self.columns = list(columns)
        with open(path, "w") as fh:  # w+ truncate parity (train.py:202)
            fh.write("\t".join(self.columns) + "\n")

    def append(self, row: Dict[str, float]) -> None:
        with open(self.path, "a") as fh:
            fh.write("\t".join(_fmt(row.get(c)) for c in self.columns) + "\n")


def _fmt(v) -> str:
    if v is None:
        return "nan"
    if isinstance(v, int):
        return str(v)
    return "%f" % float(v)


class ProgressTracker:
    """progress.json: best_model record + saved_models table
    (train.py:188-199, 236-263 parity)."""

    def __init__(self, path: str):
        self.path = path
        self.progress = {"best_model": None, "saved_models": None}
        self._saved: List[dict] = []

    def record_best(self, record: dict) -> None:
        self.progress["best_model"] = record
        self._write()

    def record_saved(self, record: dict) -> None:
        self._saved.append(record)
        self.progress["saved_models"] = self._saved
        self._write()

    def _write(self) -> None:
        with open(self.path, "w") as fh:
            json.dump(self.progress, fh, indent=4, cls=ArtifactEncoder)


def save_sample_images(images, path: str, prefix: str, suffix: str = "",
                       batch: Optional[int] = None, quality: int = 95) -> None:
    """Dump a [N,H,W,C] float [-1,1] array (or PIL list) as JPEGs with the
    reference naming scheme (data.py:345-363 parity)."""
    from video_cycle_gan_upscaling_tpu.ops.codec import array_to_image

    os.makedirs(path, exist_ok=True)
    for idx, img in enumerate(images):
        if not hasattr(img, "save"):
            img = array_to_image(img)
        if batch is None:
            name = f"{prefix}_im{idx:04d}{suffix or '_orig'}.jpg"
        else:
            name = f"{prefix}_im{idx:04d}_upscaled_{batch:06d}{suffix}.jpg"
        img.save(os.path.join(path, name), quality=quality)
