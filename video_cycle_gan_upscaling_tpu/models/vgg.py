"""VGG19 feature extractor for perceptual losses.

The reference's VGG_LOSS family feeds [-1,1] images straight into a frozen
ImageNet VGG19 and compares 'block5_conv4' features
(/root/reference/upscaling/upscaler/model.py:101-157 — note it applies NO
Keras preprocessing; we mirror that choice for parity).

Weights: ImageNet weights can be loaded from an .npz file (path via the
``VCGU_VGG19_WEIGHTS`` env var or ``load_imagenet_params``); with zero
network egress in this environment the default is a **seeded deterministic
random init**. Random-feature perceptual losses are a known-valid training
signal (they act as a fixed random projection of local image statistics);
the distinction is documented and surfaced via ``source`` so runs record
which weights they used.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG19 conv plan up to block5_conv4: (name, out_channels); 'pool' = 2x2 max.
VGG19_PLAN: Tuple = (
    ("block1_conv1", 64), ("block1_conv2", 64), "pool",
    ("block2_conv1", 128), ("block2_conv2", 128), "pool",
    ("block3_conv1", 256), ("block3_conv2", 256), ("block3_conv3", 256), ("block3_conv4", 256), "pool",
    ("block4_conv1", 512), ("block4_conv2", 512), ("block4_conv3", 512), ("block4_conv4", 512), "pool",
    ("block5_conv1", 512), ("block5_conv2", 512), ("block5_conv3", 512), ("block5_conv4", 512),
)


class VGG19Features(nn.Module):
    """VGG19 trunk, NHWC, truncated at ``output_layer`` (default
    block5_conv4, model.py:113 parity).

    ``stem_block`` > 1 evaluates block1_conv1 — the 3-input-channel conv
    that pads to 128 MXU lanes — as an S-blocked phase conv (s^2 pixels
    folded into lanes, the same trick as the generators' blocked head/
    stem; ops/subpixel.conv_same_phase_blocked is einsum-prepacked and
    differentiable, so it serves training-loss graphs). Same params,
    same map; falls back to the plain conv when the dims don't divide.
    """

    output_layer: str = "block5_conv4"
    dtype: jnp.dtype = jnp.float32
    stem_block: int = 1

    @nn.compact
    def __call__(self, x):
        y = x.astype(self.dtype)
        for item in VGG19_PLAN:
            if item == "pool":
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                continue
            name, ch = item
            sb = self.stem_block if name == "block1_conv1" else 1
            while sb > 1 and (y.shape[1] % sb or y.shape[2] % sb):
                sb //= 2
            if sb > 1:
                from video_cycle_gan_upscaling_tpu.models.blocks import (
                    _ConvParams,
                )
                from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

                w, b = _ConvParams(3, y.shape[-1], ch, name=name,
                                   parent=self)()
                yp = sp.conv_same_phase_blocked(y, w.astype(self.dtype), b,
                                                1, sb)
                y = sp.depth_to_space(yp, sb)
            else:
                y = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)(y)
            y = jax.nn.relu(y)
            if name == self.output_layer:
                return y
        raise ValueError(f"layer {self.output_layer} not in VGG19 plan")


class VGGExtractor:
    """Frozen feature extractor: module + params + jitted apply."""

    def __init__(self, params, output_layer: str = "block5_conv4",
                 dtype=jnp.float32, source: str = "random",
                 stem_block: int = 1):
        self.module = VGG19Features(output_layer=output_layer, dtype=dtype,
                                    stem_block=stem_block)
        self.params = params
        self.source = source  # 'imagenet' | 'random'

    def __call__(self, x):
        return self.module.apply({"params": self.params}, x)


def init_random_params(seed: int = 0, output_layer: str = "block5_conv4"):
    """Deterministic random VGG19 params (He init via flax defaults)."""
    module = VGG19Features(output_layer=output_layer)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return module.init(jax.random.PRNGKey(seed), dummy)["params"]


def load_imagenet_params(path: str):
    """Load VGG19 params from an .npz with keys '<layer>/kernel' (HWIO)
    and '<layer>/bias' (scripts/convert_vgg19_weights.py output; the
    converter validates every layer against the committed manifest
    assets/vgg19_imagenet_manifest.json and records the source
    checkpoint's sha256). Raises on missing layers or shape mismatches."""
    raw = np.load(path)
    params = {}
    cin = 3
    for item in VGG19_PLAN:
        if item == "pool":
            continue
        name, ch = item
        k, b = raw[f"{name}/kernel"], raw[f"{name}/bias"]
        if k.shape != (3, 3, cin, ch) or b.shape != (ch,):
            raise ValueError(f"{name}: expected kernel (3,3,{cin},{ch}) / "
                             f"bias ({ch},), got {k.shape} / {b.shape}")
        params[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        cin = ch
    return params


def get_extractor(weights_path: Optional[str] = None, seed: int = 0,
                  output_layer: str = "block5_conv4", dtype=jnp.float32,
                  stem_block: int = 1) -> VGGExtractor:
    """Build the frozen extractor; ImageNet weights if available, else the
    documented seeded-random fallback."""
    path = weights_path or os.environ.get("VCGU_VGG19_WEIGHTS")
    if path and os.path.exists(path):
        return VGGExtractor(load_imagenet_params(path), output_layer, dtype,
                            "imagenet", stem_block)
    return VGGExtractor(init_random_params(seed, output_layer), output_layer,
                        dtype, "random", stem_block)
