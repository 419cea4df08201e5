"""Model architecture summaries — the plot_model artifact analog.

The reference writes a ``model_plot.png`` per run (train.py:165 via Keras
plot_model). Here: a text tree of the param pytree with shapes and
per-module/total param counts, written as ``model_summary.txt`` next to
the loss logs.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def param_count(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def summarize_params(params: Any, title: str = "model") -> str:
    lines = [f"{title}", "=" * len(title)]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    per_module: dict = {}
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        module = keys[0] if keys else "?"
        name = "/".join(keys)
        n = int(np.prod(leaf.shape))
        per_module[module] = per_module.get(module, 0) + n
        lines.append(f"  {name:60s} {str(leaf.shape):20s} {n:>10,d}")
    lines.append("-" * 94)
    for module, n in sorted(per_module.items()):
        lines.append(f"  {module:60s} {'':20s} {n:>10,d}")
    total = param_count(params)
    lines.append(f"  {'TOTAL':60s} {'':20s} {total:>10,d}")
    return "\n".join(lines)


def write_summary(path: str, params: Any, title: str = "model") -> None:
    with open(path, "w") as fh:
        fh.write(summarize_params(params, title) + "\n")
