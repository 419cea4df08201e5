"""Image quality metrics (PSNR/SSIM) for the ≤0.1 dB parity budget.

The reference computes no quality metrics anywhere (quality judged by eye
from saved JPEGs — SURVEY.md §6); these back the rebuild's quantitative
parity harness (BASELINE config 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """PSNR in dB; default data_range=2 for [-1,1] images."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def ssim(a: jax.Array, b: jax.Array, data_range: float = 2.0,
         kernel: int = 7) -> jax.Array:
    """Mean SSIM over HxW with a uniform kernel (HWC or NHWC inputs)."""
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def avg(x):
        w = jnp.ones((kernel, kernel, 1, 1), jnp.float32) / (kernel * kernel)
        # depthwise mean filter
        return jax.lax.conv_general_dilated(
            x, jnp.tile(w, (1, 1, 1, x.shape[-1])),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )

    mu_a, mu_b = avg(a), avg(b)
    var_a = avg(a * a) - mu_a * mu_a
    var_b = avg(b * b) - mu_b * mu_b
    cov = avg(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
