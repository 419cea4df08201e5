"""Value-range codec: uint8 [0,255] <-> float [-1,1].

Parity with the reference codec (upscaling/upscaler/data.py:253-277):
``float = uint8 / 127.5 - 1`` and ``uint8 = round((float + 1) * 127.5)``.
These run on host (numpy) for IO and on device (jnp) inside jitted graphs.
"""

from __future__ import annotations

import numpy as np

try:  # PIL is available in the image; gate anyway so device-only code imports.
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

import jax.numpy as jnp


def uint8_to_unit(x):
    """uint8/float [0,255] -> float32 [-1,1]. Works for np or jnp arrays."""
    if isinstance(x, np.ndarray):
        return (x.astype(np.float32) / np.float32(127.5)) - np.float32(1.0)
    return (x.astype(jnp.float32) / jnp.float32(127.5)) - jnp.float32(1.0)


def unit_to_uint8(x):
    """float [-1,1] -> uint8 [0,255] with round-half-to-even (np.around parity)."""
    if isinstance(x, np.ndarray):
        return np.uint8(np.clip(np.around((x + 1.0) * 127.5), 0, 255))
    return jnp.clip(jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8)


def image_to_array(img) -> np.ndarray:
    """PIL image -> float32 HWC array in [-1,1] (data.py:259-263 parity)."""
    return uint8_to_unit(np.asarray(img, dtype=np.uint8))


def array_to_image(arr: np.ndarray):
    """float HWC array in [-1,1] -> PIL RGB image (data.py:253-256 parity)."""
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL not available")
    return Image.fromarray(unit_to_uint8(np.asarray(arr)))


def images_to_batch(images) -> np.ndarray:
    """Sequence of PIL images (same size) -> float32 NHWC batch in [-1,1].

    Parity with convert_image_series_to_array (data.py:266-270).
    """
    return uint8_to_unit(np.stack([np.asarray(im, dtype=np.uint8) for im in images]))
