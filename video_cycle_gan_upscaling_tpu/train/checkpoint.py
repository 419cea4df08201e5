"""Checkpointing with the reference's best+periodic policy.

The reference saves full Keras .h5 models two ways (SURVEY.md §5.4):
periodic every ``model_save_freq`` batches (train.py:248-250) and a
best-EWMA overwrite (train.py:228-231). There is NO resume path in the
reference — restore-to-train is a deliberate upgrade: checkpoints carry
the full train-state pytree {params, opt state, step, PRNG key, replay
buffers}, so a restored run continues bit-exactly (SURVEY.md §5.3/5.4).

Default backend is msgpack (flax.serialization): single-host, atomic
rename, milliseconds for these 1-10M-param models. ``backend='orbax'``
switches to orbax for multi-host / sharded use (measured ~20s per save in
this environment's orbax version — too slow for a 500-batch cadence).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


class CheckpointManager:
    """Numbered step checkpoints + a 'best' slot, atomic writes."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 backend: str = "msgpack"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self.backend = backend
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()

    def _step_path(self, step: int) -> str:
        suffix = "" if self.backend == "orbax" else ".msgpack"
        return os.path.join(self.directory, f"step_{step:08d}{suffix}")

    @property
    def best_path(self) -> str:
        suffix = "" if self.backend == "orbax" else ".msgpack"
        return os.path.join(self.directory, f"best{suffix}")

    # ------------------------------------------------------------- msgpack
    def _write(self, path: str, state: Any) -> None:
        data = serialization.to_bytes(jax.device_get(state))
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)

    def _read(self, path: str, target: Any) -> Any:
        with open(path, "rb") as fh:
            return serialization.from_bytes(target, fh.read())

    # ------------------------------------------------------------- public
    def save(self, step: int, state: Any) -> str:
        path = self._step_path(step)
        if self.backend == "orbax":
            self._ckptr.save(path, state, force=True)
            self._ckptr.wait_until_finished()
        else:
            self._write(path, state)
        self._gc()
        return path

    def save_best(self, state: Any) -> str:
        if self.backend == "orbax":
            self._ckptr.save(self.best_path, state, force=True)
            self._ckptr.wait_until_finished()
        else:
            self._write(self.best_path, state)
        return self.best_path

    def _steps(self):
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and not name.endswith(".tmp"):
                try:
                    steps.append(int(name.split("_")[1].split(".")[0]))
                except ValueError:
                    continue
        return sorted(set(steps))

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``target`` (a concrete train-state
        pytree, e.g. a freshly initialized one). Latest step if None."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self._step_path(step)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
            return self._ckptr.restore(path, abstract)
        return self._read(path, target)

    def restore_best(self, target: Any) -> Any:
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
            return self._ckptr.restore(self.best_path, abstract)
        return self._read(self.best_path, target)

    # ------------------------------------------------- structure-agnostic
    #: where the generator's params live inside each family's train state
    #: (train/state.py: TrainState, GanTrainState, CycleGanTrainState)
    GENERATOR_KEY_PATH = {
        "gan": ("g", "params"), "gan3": ("g", "params"),
        "cyclegan": ("g_ab", "params"),
    }

    def restore_raw(self, best: bool = True, step: Optional[int] = None):
        """Restore a checkpoint as a raw nested dict (no target pytree) —
        lets inference CLIs read any family's state without rebuilding
        the discriminators/optimizers that trained it."""
        if not best and step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self.best_path if best else self._step_path(step)
        if self.backend == "orbax":
            return self._ckptr.restore(path)
        with open(path, "rb") as fh:
            return serialization.msgpack_restore(fh.read())

    def restore_generator_params(self, family: str = "train",
                                 best: bool = True,
                                 step: Optional[int] = None):
        """Generator param tree from any trainer family's checkpoint."""
        raw = self.restore_raw(best=best, step=step)
        for key in self.GENERATOR_KEY_PATH.get(family, ("params",)):
            raw = raw[key]
        return raw

    def _gc(self) -> None:
        if not self.max_to_keep:
            return
        import shutil

        for s in self._steps()[: max(0, len(self._steps()) - self.max_to_keep)]:
            path = self._step_path(s)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            elif os.path.exists(path):
                os.remove(path)
