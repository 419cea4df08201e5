"""Committed trained-model assets (docs/demo) as loadable artifacts.

The on-chip convergence run (scripts/convergence_and_demo.py) committed a
TRAINED flagship generator checkpoint — docs/demo/generator_params.msgpack,
3001 fused GAN steps (wasserstein + mse) on real ukiyo frames from the
reference's stored demo outputs; docs/demo/metrics.json records its demo-
frame quality (PSNR 37.9 dB vs bicubic at x4). Benchmarks and distillation
use it as the teacher so quantization-error and student-fidelity gates are
measured on TRAINED weight statistics (what a reference user actually
deploys), not on a random init; everything falls back to the seeded random
init when the artifact is absent.

Reference anchor: the checkpoint's architecture is make_upscaler_orig
(/root/reference/upscaling/upscaler/model.py:267-295) at the train_gan.py
flagship config.
"""

from __future__ import annotations

import os
from typing import Optional

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEMO_PARAMS = os.path.join(REPO, "docs", "demo", "generator_params.msgpack")


def load_demo_generator_params(upscale_factor: int = 4,
                               path: Optional[str] = None):
    """Trained flagship UpscalerOrig params (16 blocks, 64 filters, x4).

    ``upscale_factor=2`` returns the x2 subset: ``upscale_1`` dropped —
    the final 9x9 conv consumes the same 256-channel stream either way,
    so the subset is a valid trained-statistics x2 generator (used by
    the x2 bench geometry). Returns None when the artifact is missing
    (callers fall back to a seeded random init).
    """
    from flax import serialization

    p = path or DEMO_PARAMS
    if not os.path.exists(p):
        return None
    with open(p, "rb") as fh:
        params = serialization.msgpack_restore(fh.read())
    if upscale_factor == 2:
        params = {k: v for k, v in params.items() if k != "upscale_1"}
    elif upscale_factor != 4:
        return None  # checkpoint is x4; only the x2 subset is derivable
    return params
