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


def make_augment_batch(frame_hw: Tuple[int, int],
                       synth_prob: float = 0.2) -> Callable:
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
        # one key per independent draw (ADVICE r4: reusing a key for an
        # amplitude AND its noise field deterministically correlates
        # pattern with strength, shrinking augmentation coverage)
        ks = jax.random.split(key, 13)
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
            jax.random.normal(ks[10], (h // 8, w // 8, 3)), (h, w, 3),
            "linear")
        amp_f = jax.random.uniform(ks[8], (), minval=0.0, maxval=0.04)
        x = x + amp_f * jax.random.normal(ks[11], (h, w, 3))
        # pure-synthetic frames: off-manifold coverage so the match
        # holds beyond the pool's content statistics
        x = jnp.where(jax.random.bernoulli(ks[9], synth_prob),
                      _noise_image(ks[12]), x)
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


# --------------------------------------------------------------------------
# Pure-function trunk walker: the UpscalerOrig forward expressed directly
# over a standard params tree, exposing (a) the residual stream after every
# block — dense per-block "hint" supervision for depth distillation
# (FitNets-style: student block j is trained to absorb its dropped
# neighbours' contribution locally instead of chasing a 10-conv-deep
# output signal), and (b) straight-through fake-quantization mirroring the
# fused runner's W8A8 semantics (per-channel activation scales folded into
# per-out-channel int8 weights; InstanceNorm absorbs the overall scale —
# ops/quant.py invariance) for quantization-aware fine-tuning.
# Numerics match models/blocks.py exactly: same vops conv, same fused
# Pallas instance-norm kernels (which carry custom VJPs for training).
# --------------------------------------------------------------------------


def fake_quant_act(z: jax.Array, s: jax.Array) -> jax.Array:
    """Per-channel symmetric int8 fake-quant with identity STE.
    ``s`` [C] = 127/amax from calibration (frozen during QAT)."""
    zf = z.astype(jnp.float32)
    q = jnp.clip(jnp.round(zf * s), -127.0, 127.0) / s
    return (zf + jax.lax.stop_gradient(q - zf)).astype(z.dtype)


def fake_quant_kernel(w: jax.Array, s_in: jax.Array) -> jax.Array:
    """Weight fake-quant mirroring fused_conv.quantize_packed_kernel: the
    input-channel activation scales fold into the kernel's input axis,
    then per-OUT-channel symmetric int8; dequantized back, identity STE.
    ``w`` HWIO, ``s_in`` [C_in]."""
    wf = w.astype(jnp.float32) / s_in[None, None, :, None]
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True),
                       1e-8)
    sw = 127.0 / amax
    qw = (jnp.clip(jnp.round(wf * sw), -127.0, 127.0) / sw
          ) * s_in[None, None, :, None]
    return (w + jax.lax.stop_gradient(qw.astype(w.dtype) - w))


def trunk_walk(params: dict, x: jax.Array, n_blocks: int, *,
               dtype=jnp.bfloat16, qset: frozenset = frozenset(),
               scales: dict | None = None, collect_streams: bool = False,
               collect_amax: bool = False, remat: bool = False):
    """UpscalerOrig stem+trunk from a standard params tree.

    Returns (trunk_out, aux): aux is the per-block residual-stream list
    (``collect_streams``), the per-conv-input abs-max dict
    (``collect_amax`` — the QAT calibration observables, mirroring
    FastOrigRunner.apply_trunk's), or None. ``qset`` follows
    fast_infer.parse_mix_spec unit numbering (block i = both its convs,
    unit n_blocks = the prefinal conv); quantized convs need ``scales``
    entries (from ``qat_calibrate``). ``remat``: per-block
    jax.checkpoint — the backward recomputes each block's conv/norm
    temps from its boundary stream instead of storing them (the
    boundary streams are kept anyway; VERDICT r4 item 3 — the walker
    step was HBM-bound at batch 1)."""
    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

    def conv(tag, z, kern, bias, unit, sc=None):
        if unit in qset:
            s = sc if sc is not None else scales[tag]
            z = fake_quant_act(z, s)
            kern = fake_quant_kernel(kern, s)
        return vops.same_conv(z.astype(dtype), kern.astype(dtype), bias)

    amaxes: dict = {}

    def note(tag, z):
        if collect_amax:
            amaxes[tag] = jnp.max(jnp.abs(z.astype(jnp.float32)),
                                  axis=tuple(range(z.ndim - 1)))

    def block_body(h, blk, unit, sc_pre, sc_post):
        a = conv("", h, blk["conv_pre"]["kernel"],
                 blk["conv_pre"]["bias"], unit, sc_pre)
        a = pnorms.instance_norm_act(a, blk["norm_pre"]["scale"],
                                     blk["norm_pre"]["bias"],
                                     blk["prelu"]["alpha"], "prelu")
        b = conv("", a, blk["conv_post"]["kernel"],
                 blk["conv_post"]["bias"], unit, sc_post)
        return pnorms.instance_norm_residual(b, blk["norm_post"]["scale"],
                                             blk["norm_post"]["bias"], h)

    run_block = (jax.checkpoint(block_body, static_argnums=(2,))
                 if remat else block_body)

    x = x.astype(dtype)
    h = vops.same_conv(x, params["initial_conv"]["kernel"].astype(dtype),
                       params["initial_conv"]["bias"])
    h = vops.prelu(h, params["initial_prelu"]["alpha"])
    h0 = h
    streams = []
    for i in range(n_blocks):
        blk = params[f"res_block_{i}"]
        if collect_amax:
            # amax collection bypasses the remat wrapper (observables
            # must escape the checkpointed scope)
            note(f"pre_{i}", h)
            a = conv(f"pre_{i}", h, blk["conv_pre"]["kernel"],
                     blk["conv_pre"]["bias"], i)
            a = pnorms.instance_norm_act(a, blk["norm_pre"]["scale"],
                                         blk["norm_pre"]["bias"],
                                         blk["prelu"]["alpha"], "prelu")
            note(f"post_{i}", a)
            b = conv(f"post_{i}", a, blk["conv_post"]["kernel"],
                     blk["conv_post"]["bias"], i)
            h = pnorms.instance_norm_residual(b, blk["norm_post"]["scale"],
                                              blk["norm_post"]["bias"], h)
        else:
            sc_pre = scales[f"pre_{i}"] if i in qset else None
            sc_post = scales[f"post_{i}"] if i in qset else None
            h = run_block(h, blk, i, sc_pre, sc_post)
        if collect_streams:
            streams.append(h)
    note("prefinal", h)
    p = conv("prefinal", h, params["prefinal_conv"]["kernel"],
             params["prefinal_conv"]["bias"], n_blocks)
    trunk = pnorms.instance_norm_residual(p, params["prefinal_norm"]["scale"],
                                          params["prefinal_norm"]["bias"], h0)
    if collect_streams:
        return trunk, streams
    if collect_amax:
        return trunk, amaxes
    return trunk, None


def tail_walk(params: dict, trunk: jax.Array, upscale_factor: int, *,
              dtype=jnp.bfloat16, head_block: int = 4,
              fq_scales: dict | None = None,
              remat: bool = False) -> jax.Array:
    """Pixel tail over the standard params tree (transpose convs as the
    subpixel d2s rewrite + the S-blocked head), matching
    UpscalerOrig(phase_tail=False, head_block=...).

    ``fq_scales`` (tail QAT): per-channel activation scales
    {"tail_in": [C], "up_0": [C'], ...} from ``qat_calibrate_tail``;
    when given, every tail conv input is STE-fake-quantized per channel
    and its kernel per out-channel with the input scales folded —
    mirroring the fused runner's W8A8 tail (fast_infer._tail_int8).
    Grain is slightly COARSER than runtime (canonical kernels instead of
    prepacked phase slots; symmetric head-input instead of the zp
    asymmetric emit), so a student trained through this sim sees at
    least the runtime's quantization noise. Motivated by the round-4
    trained-weights finding: the tail carries nearly all W8A8 error on
    trained statistics (38-44 dB, MISSing the budget gate at both
    geometries) — training the student THROUGH the quantized tail lets
    its weights absorb that error."""
    import math

    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    def up_stage(y, w, b, s):
        if s is not None:
            w = fake_quant_kernel(w, s)
            y = fake_quant_act(y, s)
        y = sp.conv_transpose_d2s(y.astype(dtype), w.astype(dtype),
                                  b, stride=2)
        return vops.leaky_relu(y, 0.2)

    def head_stage(y, w9, b9, s):
        if s is not None:
            y = fake_quant_act(y, s)
            w9 = fake_quant_kernel(w9, s)
        w9 = w9.astype(dtype)
        hb = head_block
        while hb > 1 and (y.shape[1] % hb or y.shape[2] % hb):
            hb //= 2
        if hb > 1:
            yp = sp.conv_same_phase_blocked(y, w9, b9, 1, hb)
            yp = jnp.tanh(yp.astype(jnp.float32))
            return sp.depth_to_space(yp, hb)
        return jnp.tanh(vops.same_conv(y, w9, b9).astype(jnp.float32))

    if remat:
        # per-stage checkpoint: the HR tail temps dominate the walker's
        # HBM footprint (~2 GB fwd+bwd at 540p batch 1 — the reason the
        # round-4 QAT runs were stuck at batch 1); the backward
        # recomputes each stage from its (much smaller) boundary input
        up_stage = jax.checkpoint(up_stage)
        head_stage = jax.checkpoint(head_stage)

    y = trunk
    for i in range(int(math.log2(upscale_factor))):
        up = params[f"upscale_{i}"]["conv_transp"]
        s = None
        if fq_scales is not None:
            s = fq_scales["tail_in"] if i == 0 else fq_scales[f"up_{i - 1}"]
        y = up_stage(y, up["kernel"], up["bias"], s)
    s9 = None
    if fq_scales is not None:
        s9 = fq_scales[f"up_{int(math.log2(upscale_factor)) - 1}"]
    return head_stage(y, params["final_conv"]["kernel"],
                      params["final_conv"]["bias"], s9)


def qat_calibrate_tail(params: dict, x: jax.Array, n_blocks: int,
                       upscale_factor: int,
                       dtype=jnp.bfloat16) -> dict:
    """Per-channel activation scales (127/abs-max) for the tail QAT sim:
    the trunk output ("tail_in") and each up conv's post-LeakyReLU
    output ("up_i"), measured on a calibration batch — the walker analog
    of FastOrigRunner._tail_amax."""
    import math

    from video_cycle_gan_upscaling_tpu.ops import nn as vops
    from video_cycle_gan_upscaling_tpu.ops import subpixel as sp

    def observe(p, xx):
        trunk, _ = trunk_walk(p, xx, n_blocks, dtype=dtype)
        out = {"tail_in": jnp.max(jnp.abs(trunk.astype(jnp.float32)),
                                  axis=(0, 1, 2))}
        y = trunk
        for i in range(int(math.log2(upscale_factor))):
            up = p[f"upscale_{i}"]["conv_transp"]
            y = sp.conv_transpose_d2s(y.astype(dtype),
                                      up["kernel"].astype(dtype),
                                      up["bias"], stride=2)
            y = vops.leaky_relu(y, 0.2)
            out[f"up_{i}"] = jnp.max(jnp.abs(y.astype(jnp.float32)),
                                     axis=(0, 1, 2))
        return out

    amax = jax.jit(observe)(params, x)
    return {k: 127.0 / jnp.maximum(jnp.asarray(v, jnp.float32), 1e-6)
            for k, v in amax.items()}


def qat_calibrate(params: dict, x: jax.Array, n_blocks: int,
                  qset: frozenset, dtype=jnp.bfloat16) -> dict:
    """Per-channel activation quant scales (127/abs-max) for every
    fake-quantized conv input, measured on a calibration batch at the
    CURRENT params — frozen during QAT (the runner's calibrate()
    recomputes its own from the trained weights at deploy time; the
    residual drift only moves rounding-grid granularity)."""
    _, amaxes = jax.jit(
        lambda p, xx: trunk_walk(p, xx, n_blocks, dtype=dtype,
                                 collect_amax=True))(params, x)
    tags = []
    for i in range(n_blocks):
        if i in qset:
            tags += [f"pre_{i}", f"post_{i}"]
    if n_blocks in qset:
        tags.append("prefinal")
    return {t: 127.0 / jnp.maximum(
        jnp.asarray(amaxes[t], jnp.float32), 1e-6) for t in tags}


def make_walk_distill_step(n_student: int, n_teacher: int,
                           upscale_factor: int, frame_hw: Tuple[int, int],
                           batch: int, *, qset: frozenset = frozenset(),
                           scales: dict | None = None,
                           tail_fq: dict | None = None,
                           hint_weight: float = 0.5,
                           hint_decay_steps: int = 0,
                           feat_weight: float = 0.1,
                           synth_prob: float = 0.2,
                           dtype=jnp.bfloat16, head_block: int = 4,
                           seed: int = 0, remat: bool = False) -> Callable:
    """Walker-based distillation/QAT update (one dispatch).

    Supervision at three depths, all against the teacher's walker forward
    (one teacher trunk evaluation serves all of them):
    - out:  MSE of final images;
    - feat: relative MSE of the post-global-skip trunk features;
    - hint: mean over student blocks j of the relative MSE between the
      student's residual stream after block j and the teacher's stream
      after source block keep[j] (select_student_blocks) — the dense
      local signal that makes depth compression trainable (the pure
      output loss moved ~+3 dB/1k steps from a 19 dB init in the first
      x2 K=8 run; hints give every block its own target).
    Relative = normalized by stop_grad(mean(target^2)): the stream grows
    ~sqrt(depth), absolute MSEs would overweight late blocks.

    For QAT pass ``qset``/``scales`` (qat_calibrate) — with
    n_student == n_teacher and init == teacher params this fine-tunes the
    int8 path against the bf16 teacher from an exact-match init.

    ``hint_decay_steps`` > 0 anneals the hint+feat weights linearly to
    zero over that many steps (curriculum: dense per-block guidance
    rescues the pruned init — measured +16 dB in the first 400 steps of
    the x2 K=8 run — but a shallower trunk cannot match the teacher's
    streams exactly, so a CONSTANT hint term eventually competes with
    output fidelity; the anneal hands the endgame to the output loss).
    """
    keep = select_student_blocks(n_teacher, n_student)
    augment = make_augment_batch(frame_hw, synth_prob)
    base_key = jax.random.PRNGKey(seed)

    def rel_mse(a, b):
        b = b.astype(jnp.float32)
        num = jnp.mean((a.astype(jnp.float32) - b) ** 2)
        return num / (jax.lax.stop_gradient(jnp.mean(b ** 2)) + 1e-8)

    # hint streams cost ~(n_teacher + n_student) HBM-resident frame-size
    # tensors; don't even collect them when the weight is zero (the QAT
    # fine-tune runs output-only and was RESOURCE_EXHAUSTED with them)
    use_hints = hint_weight > 0.0

    @partial(jax.jit, donate_argnums=0)
    def step(state, teacher_params, pool):
        key = jax.random.fold_in(base_key, state.step)
        x = augment(key, pool, batch)
        t_trunk, t_streams = trunk_walk(teacher_params, x, n_teacher,
                                        dtype=dtype,
                                        collect_streams=use_hints)
        t_out = tail_walk(teacher_params, t_trunk, upscale_factor,
                          dtype=dtype, head_block=head_block)
        t_out = jax.lax.stop_gradient(t_out)
        t_trunk = jax.lax.stop_gradient(t_trunk)
        t_hints = ([jax.lax.stop_gradient(t_streams[k]) for k in keep]
                   if use_hints else None)

        def loss_fn(params):
            s_trunk, s_streams = trunk_walk(params, x, n_student,
                                            dtype=dtype, qset=qset,
                                            scales=scales,
                                            collect_streams=use_hints,
                                            remat=remat)
            s_out = tail_walk(params, s_trunk, upscale_factor, dtype=dtype,
                              head_block=head_block, fq_scales=tail_fq,
                              remat=remat)
            l_out = jnp.mean((s_out - t_out) ** 2)
            l_feat = rel_mse(s_trunk, t_trunk)
            l_hint = (sum(rel_mse(s, t) for s, t in
                          zip(s_streams, t_hints)) / n_student
                      if use_hints else jnp.float32(0.0))
            anneal = 1.0
            if hint_decay_steps > 0:
                anneal = jnp.clip(1.0 - state.step / hint_decay_steps,
                                  0.0, 1.0)
            total = (l_out + anneal * (feat_weight * l_feat
                                       + hint_weight * l_hint))
            return total, (l_out, l_feat, l_hint)

        (loss, (l_out, l_feat, l_hint)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(l_out, 1e-12))
        return new_state, {"loss": loss, "loss_out": l_out,
                           "loss_feat": l_feat, "loss_hint": l_hint,
                           "psnr": psnr}

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
