"""JSON encoder for run artifacts.

Parity with the reference's PandasEncoder (upscaling/upscaler/json.py:5-16):
DataFrame -> records, Series -> list, np integers/floats -> python scalars.
Extended for numpy arrays, jax arrays, paths and dataclasses so resolved
configs serialize directly.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np


class ArtifactEncoder(json.JSONEncoder):
    def default(self, obj):
        try:
            import pandas as pd

            if isinstance(obj, pd.DataFrame):
                return obj.to_dict(orient="records")
            if isinstance(obj, pd.Series):
                return obj.tolist()
        except Exception:
            pass
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, pathlib.Path):
            return str(obj)
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return dataclasses.asdict(obj)
        if hasattr(obj, "tolist"):  # jax arrays
            return obj.tolist()
        return super().default(obj)


# Reference-compatible alias (json.py:5).
PandasEncoder = ArtifactEncoder
