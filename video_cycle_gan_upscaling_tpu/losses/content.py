"""Content (reconstruction) losses.

Parity with the reference loss classes
(/root/reference/upscaling/upscaler/model.py:101-157):
- vgg-only: MSE between frozen VGG19 block5_conv4 features (VGG_LOSS)
- vgg-mse : feature MSE + rate * pixel MSE (VGG_MSE_LOSS)
- vgg-mae : feature MAE + rate * pixel MAE (VGG_MAE_LOSS)
plus plain pixel mse/mae for VGG-free training and CycleGAN cycle/identity
terms. All reductions in f32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def _per_example(x):
    """Reduce all axes except batch."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def pixel_mse(y_true, y_pred):
    return jnp.mean(jnp.square(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def pixel_mae(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def pixel_mse_per_example(y_true, y_pred):
    return _per_example(jnp.square(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def pixel_mae_per_example(y_true, y_pred):
    return _per_example(jnp.abs(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def make_content_loss(kind: str, rate: float = 0.001,
                      vgg: Optional[Callable] = None) -> Callable:
    """Return loss(y_true, y_pred) -> scalar.

    ``vgg`` is a frozen feature callable (models.vgg.VGGExtractor); its
    params ride into jit as closure constants — frozen weights, zero
    retrace. ``rate`` is the reference's non_vgg_loss_weight
    (train.py:38, default 0.001)."""
    if kind == "mse":
        return pixel_mse
    if kind == "mae":
        return pixel_mae
    if kind in ("vgg-only", "vgg-mse", "vgg-mae"):
        if vgg is None:
            raise ValueError(f"content loss '{kind}' requires a VGG extractor")
        per = make_content_loss_per_example(kind, rate, vgg)
        return lambda y_true, y_pred: jnp.mean(per(y_true, y_pred))
    raise ValueError(f"unknown content loss: {kind}")


def make_content_loss_per_example(kind: str, rate: float = 0.001,
                                  vgg: Optional[Callable] = None) -> Callable:
    """Per-example variant: loss(y_true, y_pred) -> [B]. Used by the cgc
    trainers to log per-source (gen1/gen2/scaled) losses from a single
    fused batch (train_cgc.py:280-284 parity without 3 device trips)."""
    if kind == "mse":
        return pixel_mse_per_example
    if kind == "mae":
        return pixel_mae_per_example
    if kind in ("vgg-only", "vgg-mse", "vgg-mae"):
        if vgg is None:
            raise ValueError(f"content loss '{kind}' requires a VGG extractor")
        if kind == "vgg-only":
            def loss(y_true, y_pred):
                return pixel_mse_per_example(vgg(y_true), vgg(y_pred))
        elif kind == "vgg-mse":
            def loss(y_true, y_pred):
                return (pixel_mse_per_example(vgg(y_true), vgg(y_pred))
                        + rate * pixel_mse_per_example(y_true, y_pred))
        else:
            def loss(y_true, y_pred):
                return (pixel_mae_per_example(vgg(y_true), vgg(y_pred))
                        + rate * pixel_mae_per_example(y_true, y_pred))
        return loss
    raise ValueError(f"unknown content loss: {kind}")
