"""Trained-equivalence student trunks (distillation) for fast inference.

The compliant x2 540p->1080p ceiling with the 16-block teacher trunk is
~32.5 fps on one v5e chip: the bf16 trunk alone is ~22 ms/frame at ~80%
MFU and W8A8 across the whole trunk is error-capped ~10 dB below the
budget-derived 46.3 dB quality gate (docs/PERF.md round-3 per-channel
calibration section). The one remaining lever toward the 60 fps target is
a TRAINED smaller trunk: an ``UpscalerOrig`` with fewer res blocks,
initialized from the teacher's own weights (evenly-spaced block subset)
and distilled to reproduce the teacher's input->output function (output
MSE + trunk-feature MSE on augmented real-frame content). The student's
param tree is a standard ``UpscalerOrig`` tree, so the whole fused
inference stack (models/fast_infer.FastOrigRunner, ``res_block_num`` is
parametric) and the quantized tail/mix machinery apply unchanged; the
bench gate then measures STUDENT-vs-TEACHER PSNR on the held-out frame
(the documented comparison change: quality is relative to the bf16
teacher, the model a user actually trained).

Reference anchor: the upscaler trunk being shrunk is make_upscaler_orig
(/root/reference/upscaling/upscaler/model.py:267-295); the reference has
no distillation machinery (capability upgrade, like resume/DP).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def select_student_blocks(n_teacher: int, n_student: int) -> Tuple[int, ...]:
    """Evenly-spaced teacher block indices (first and last kept: the x2
    mix sweep showed EARLY blocks dominate function sensitivity —
    docs/PERF.md mixed-precision findings — and the last block feeds the
    prefinal conv directly)."""
    assert 1 <= n_student <= n_teacher
    if n_student == 1:
        return (0,)
    idx = np.round(np.linspace(0, n_teacher - 1, n_student)).astype(int)
    # linspace with rounding can collide at small n; enforce uniqueness
    idx = np.unique(idx)
    while len(idx) < n_student:  # pragma: no cover - tiny-n fallback
        missing = sorted(set(range(n_teacher)) - set(idx.tolist()))
        idx = np.sort(np.append(idx, missing[0]))
    return tuple(int(i) for i in idx)


def student_params_from_teacher(teacher_params: dict, n_student: int,
                                n_teacher: int | None = None) -> dict:
    """Standard ``UpscalerOrig`` param tree with ``n_student`` res blocks:
    stem / prefinal / tail copied from the teacher, res blocks taken at
    evenly-spaced teacher indices and renumbered contiguously."""
    if n_teacher is None:
        n_teacher = sum(1 for k in teacher_params if k.startswith("res_block_"))
    keep = select_student_blocks(n_teacher, n_student)
    # copy=True: the student state is donated by the distill step while the
    # teacher params stay live as a separate argument — aliased buffers
    # would trip XLA's donation check (`f(donate(a), a)`)
    copy = lambda t: jax.tree_util.tree_map(
        lambda v: jnp.array(v, copy=True), t)
    out = {}
    for k, v in teacher_params.items():
        if not k.startswith("res_block_"):
            out[k] = copy(v)
    for j, i in enumerate(keep):
        out[f"res_block_{j}"] = copy(teacher_params[f"res_block_{i}"])
    return out


def make_augment_batch(frame_hw: Tuple[int, int]) -> Callable:
    """Device-side training-batch synthesizer: (key, pool[P,H,W,3] f32 in
    [-1,1], batch) -> [B,H,W,3] — random pool-pair blends, cyclic rolls,
    flips, multi-scale noise fields, and occasional pure-synthetic
    frames. Distillation needs INPUT coverage (the student must match the
    teacher's function on the eval distribution, not memorize one frame);
    everything runs inside the caller's jit so a step stays one dispatch.
    """
    h, w = frame_hw

    def _noise_image(key):
        k1, k2, k3 = jax.random.split(key, 3)
        img = (jax.image.resize(jax.random.normal(k1, (h // 16, w // 16, 3)),
                                (h, w, 3), "linear") * 0.6
               + jax.image.resize(jax.random.normal(k2, (h // 4, w // 4, 3)),
                                  (h, w, 3), "linear") * 0.3
               + jax.random.normal(k3, (h, w, 3)) * 0.1)
        return jnp.clip(img, -1.0, 1.0)

    def one(key, pool):
        p = pool.shape[0]
        ks = jax.random.split(key, 10)
        a = pool[jax.random.randint(ks[0], (), 0, p)]
        b = pool[jax.random.randint(ks[1], (), 0, p)]
        alpha = jax.random.uniform(ks[2], (), minval=0.5, maxval=1.0)
        x = alpha * a + (1 - alpha) * b
        x = jnp.roll(x, (jax.random.randint(ks[3], (), 0, h),
                         jax.random.randint(ks[4], (), 0, w)), axis=(0, 1))
        x = jnp.where(jax.random.bernoulli(ks[5]), x[::-1], x)
        x = jnp.where(jax.random.bernoulli(ks[6]), x[:, ::-1], x)
        amp_c = jax.random.uniform(ks[7], (), minval=0.0, maxval=0.25)
        x = x + amp_c * jax.image.resize(
            jax.random.normal(ks[7], (h // 8, w // 8, 3)), (h, w, 3),
            "linear")
        amp_f = jax.random.uniform(ks[8], (), minval=0.0, maxval=0.04)
        x = x + amp_f * jax.random.normal(ks[8], (h, w, 3))
        # ~20% pure-synthetic frames: off-manifold coverage so the match
        # holds beyond the pool's content statistics
        x = jnp.where(jax.random.bernoulli(ks[9], 0.2), _noise_image(ks[9]),
                      x)
        return jnp.clip(x, -1.0, 1.0)

    def batch_fn(key, pool, batch: int):
        return jax.vmap(lambda k: one(k, pool))(jax.random.split(key, batch))

    return batch_fn


def make_distill_step(student_model, teacher_forward,
                      frame_hw: Tuple[int, int], batch: int,
                      feat_weight: float = 0.05, seed: int = 0) -> Callable:
    """One-dispatch distillation update: on-device batch synthesis ->
    teacher forward (no grad) -> student fwd/bwd -> Adam. Loss = MSE of
    outputs + ``feat_weight`` * MSE of the trunk features (the tail input
    — same [*,h,w,filters] shape for any block count; matching it guides
    the shrunken trunk toward the teacher's representation, not just its
    output). (state, teacher_params, pool) -> (state, metrics).

    ``teacher_forward(teacher_params, x) -> (out, trunk_feat)`` — pass
    the fused runner's bf16 graph (FastOrigRunner apply_stem/trunk/tail
    over its qp) so the training target IS the function the bench gate
    references, absorbing the teacher-side runner-vs-modular numeric
    delta into the training signal; a modular
    ``model.apply(..., return_trunk=True)`` works too (tests)."""
    augment = make_augment_batch(frame_hw)
    base_key = jax.random.PRNGKey(seed)

    @partial(jax.jit, donate_argnums=0)
    def step(state, teacher_params, pool):
        key = jax.random.fold_in(base_key, state.step)
        x = augment(key, pool, batch)
        t_out, t_feat = teacher_forward(teacher_params, x)
        t_out = jax.lax.stop_gradient(t_out.astype(jnp.float32))
        t_feat = jax.lax.stop_gradient(t_feat.astype(jnp.float32))

        def loss_fn(params):
            s_out, s_feat = student_model.apply({"params": params}, x,
                                                return_trunk=True)
            l_out = jnp.mean((s_out.astype(jnp.float32) - t_out) ** 2)
            l_feat = jnp.mean((s_feat.astype(jnp.float32) - t_feat) ** 2)
            return l_out + feat_weight * l_feat, (l_out, l_feat)

        (loss, (l_out, l_feat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        # distill PSNR vs the teacher on this batch ([-1,1] range => peak 2)
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(l_out, 1e-12))
        return new_state, {"loss": loss, "loss_out": l_out,
                           "loss_feat": l_feat, "psnr": psnr}

    return step


def make_eval_psnr(student_forward, teacher_forward) -> Callable:
    """jitted (student_params, teacher_params, frames[B,H,W,3]) ->
    mean per-frame PSNR (dB) of student vs teacher outputs. Both sides
    are ``fn(params, frames) -> out`` callables (pass flax apply or
    runner graphs); a flax module is accepted and wrapped."""

    def _as_fn(side):
        if hasattr(side, "apply"):
            return lambda p, x: side.apply({"params": p}, x)
        return side

    s_fn, t_fn = _as_fn(student_forward), _as_fn(teacher_forward)

    @jax.jit
    def eval_fn(params, teacher_params, frames):
        s = s_fn(params, frames)
        t = t_fn(teacher_params, frames)
        err = (s.astype(jnp.float32) - t.astype(jnp.float32)) ** 2
        mse = jnp.mean(err, axis=(1, 2, 3))
        return jnp.mean(10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12)))

    return eval_fn
