"""W8A8 "turbo" inference runner for the flagship UpscalerOrig.

Takes a trained (or initialized) UpscalerOrig param tree and runs the
trunk in int8 on the MXU (~1.8x the bf16 conv rate on v5e):

- stem (3-channel conv + PReLU) stays bf16; its output is dynamically
  quantized per tensor,
- every trunk conv runs int8 x int8 -> int32; the fused quantized norm
  kernel (ops/pallas/quant_norms.py) normalizes the raw accumulator
  (conv scales/biases cancel in InstanceNorm), applies gamma/beta +
  PReLU, folds residual adds in the integer domain, and emits int8,
- the residual stream uses a wider static scale (RSCALE) than block
  activations (QSCALE) since trunk magnitudes grow with depth,
- the upsampling tail runs the bf16 phase-space path (same as
  phase_tail=True).

Exactness: this is a lossy acceleration (int8). Quality vs the bf16 path
is measured in tests (PSNR) and reported next to the turbo benchmark.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from video_cycle_gan_upscaling_tpu.ops import nn as vops
from video_cycle_gan_upscaling_tpu.ops import subpixel as sp
from video_cycle_gan_upscaling_tpu.ops.pallas.quant_norms import instance_norm_act_quant
from video_cycle_gan_upscaling_tpu.ops.quant import (
    QSCALE,
    conv_int8,
    quantize_activations_dynamic,
    quantize_weights,
)

RSCALE = 127.0 / 16.0  # residual-stream scale (wider than QSCALE)


def quantize_orig_params(params: Dict[str, Any], res_block_num: int = 16,
                         upscale_times: int | None = None) -> Dict[str, Any]:
    """UpscalerOrig param tree -> quantized inference param tree."""
    q: Dict[str, Any] = {
        "stem_w": params["initial_conv"]["kernel"],
        "stem_b": params["initial_conv"]["bias"],
        "stem_alpha": params["initial_prelu"]["alpha"],
        "blocks": [],
        "prefinal_w": quantize_weights(params["prefinal_conv"]["kernel"]),
        "prefinal_g": params["prefinal_norm"]["scale"],
        "prefinal_be": params["prefinal_norm"]["bias"],
        "final_w": params["final_conv"]["kernel"],
        "final_b": params["final_conv"]["bias"],
        "ups": [],
    }
    for i in range(res_block_num):
        blk = params[f"res_block_{i}"]
        q["blocks"].append({
            "w_pre": quantize_weights(blk["conv_pre"]["kernel"]),
            "g1": blk["norm_pre"]["scale"],
            "b1": blk["norm_pre"]["bias"],
            "alpha": blk["prelu"]["alpha"],
            "w_post": quantize_weights(blk["conv_post"]["kernel"]),
            "g2": blk["norm_post"]["scale"],
            "b2": blk["norm_post"]["bias"],
        })
    i = 0
    while f"upscale_{i}" in params:
        up = params[f"upscale_{i}"]["conv_transp"]
        q["ups"].append({"kernel": up["kernel"], "bias": up["bias"]})
        i += 1
    return q


def quantized_orig_apply(qp: Dict[str, Any], x: jax.Array,
                         dtype=jnp.bfloat16) -> jax.Array:
    """Forward pass matching UpscalerOrig(phase_tail=True) semantics with
    an int8 trunk. x: [N,H,W,3] in [-1,1]."""
    xb = x.astype(dtype)
    y = vops.same_conv(xb, qp["stem_w"].astype(dtype), qp["stem_b"])
    y = vops.prelu(y, qp["stem_alpha"])
    trunk_q, sx = quantize_activations_dynamic(y)

    h = trunk_q
    zero = jnp.zeros((1,), jnp.float32)
    for i, blk in enumerate(qp["blocks"]):
        acc = conv_int8(h, blk["w_pre"], out_dtype=dtype)
        mid = instance_norm_act_quant(acc, blk["g1"], blk["b1"], blk["alpha"],
                                      "prelu", out_scale=QSCALE)
        acc2 = conv_int8(mid, blk["w_post"], out_dtype=dtype)
        rescale = (RSCALE / sx) if i == 0 else (RSCALE / RSCALE)
        h = instance_norm_act_quant(acc2, blk["g2"], blk["b2"], zero, "none",
                                    out_scale=RSCALE, residual=h,
                                    res_rescale=rescale)

    acc3 = conv_int8(h, qp["prefinal_w"], out_dtype=dtype)
    out_q = instance_norm_act_quant(acc3, qp["prefinal_g"], qp["prefinal_be"],
                                    zero, "none", out_scale=RSCALE,
                                    residual=trunk_q, res_rescale=RSCALE / sx)
    y = out_q.astype(dtype) / jnp.asarray(RSCALE, dtype)

    # bf16 phase-space upsampling tail (ops/subpixel.py)
    r = 1
    for up in qp["ups"]:
        y = sp.transpose_conv_phase(y, up["kernel"].astype(dtype), up["bias"],
                                    2, r)
        y = vops.leaky_relu(y, 0.2)
        r *= 2
    extra = 1
    for e in (4, 2):
        if y.shape[1] % e == 0 and y.shape[2] % e == 0:
            extra = e
            break
    yp = sp.conv_same_phase_blocked(y, qp["final_w"].astype(dtype),
                                    qp["final_b"], r, extra)
    yp = jnp.tanh(yp.astype(jnp.float32))
    return sp.depth_to_space(yp, r * extra)
