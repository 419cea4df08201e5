"""Device mesh + data-parallel sharding (BASELINE config 5).

The reference is strictly single-GPU (train_gan2.py:25-27 asserts it;
SURVEY.md §2.8). The TPU-native scale-out is pure data parallelism — these
models are 1-10M params, so replicated params + batch sharding over a 1-D
mesh is the right point in the sharding space (scaling-book recipe: pick a
mesh, annotate shardings, let XLA insert the gradient all-reduce over ICI).

``data_parallel_step`` wraps a fused train step with jit in/out shardings:
batch split on axis 0 across 'data', state replicated. Loss means inside
the step become global means — XLA inserts the psum/all-reduce; no pmap,
no per-device code.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over available devices (ICI ring on a TPU slice)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the mesh; all other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, replicated(mesh))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a batch pytree sharded on axis 0 over the mesh."""
    return jax.device_put(batch, batch_sharding(mesh, axis_name))


def data_parallel_step(step_fn: Callable, mesh: Mesh, n_batch_args: int,
                       axis_name: str = "data", donate_state: bool = True) -> Callable:
    """Wrap ``step_fn(state, *batch) -> (state, metrics)`` for DP execution.

    State (arg 0) replicated; each of the ``n_batch_args`` batch args
    sharded on axis 0; outputs (state, metrics) replicated. Requires
    global batch % n_devices == 0. Accepts either the raw step body or a
    jitted one from the make_*_step factories (unwrapped via __wrapped__).
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis_name)
    return jax.jit(
        getattr(step_fn, "__wrapped__", step_fn),
        in_shardings=(repl,) + (bsh,) * n_batch_args,
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
