"""Student-trunk distillation machinery (train/distill.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
from video_cycle_gan_upscaling_tpu.train import (
    create_generator_state,
    make_distill_step,
    make_eval_psnr,
    select_student_blocks,
    student_params_from_teacher,
)

KEY = jax.random.PRNGKey(0)


def _model(blocks, **kw):
    return UpscalerOrig(kernel_size=3, filters=8, upscale_factor=2,
                        res_block_num=blocks, dtype=jnp.float32, **kw)


def test_select_student_blocks():
    assert select_student_blocks(16, 16) == tuple(range(16))
    keep = select_student_blocks(16, 8)
    assert len(keep) == 8 and keep[0] == 0 and keep[-1] == 15
    assert all(a < b for a, b in zip(keep, keep[1:]))
    assert select_student_blocks(4, 1) == (0,)


def test_full_width_student_equals_teacher():
    """K == n_teacher must reproduce the teacher bit-for-bit (the init is
    a pure copy, so any divergence would be a renumbering bug)."""
    teacher = _model(4)
    x = jax.random.uniform(KEY, (1, 8, 10, 3), minval=-1, maxval=1)
    tp = teacher.init(KEY, x)["params"]
    sp = student_params_from_teacher(tp, 4)
    t_out = teacher.apply({"params": tp}, x)
    s_out = _model(4).apply({"params": sp}, x)
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(s_out))


def test_student_params_structure():
    teacher = _model(4)
    x = jnp.zeros((1, 8, 10, 3))
    tp = teacher.init(KEY, x)["params"]
    sp = student_params_from_teacher(tp, 2)
    assert sorted(k for k in sp if k.startswith("res_block_")) == [
        "res_block_0", "res_block_1"]
    # student blocks are teacher blocks 0 and 3 (evenly spaced)
    np.testing.assert_array_equal(
        np.asarray(sp["res_block_1"]["conv_pre"]["kernel"]),
        np.asarray(tp["res_block_3"]["conv_pre"]["kernel"]))
    # the student tree drives the model directly
    out = _model(2).apply({"params": sp}, x)
    assert out.shape == (1, 16, 20, 3)


def test_return_trunk_matches_default_output():
    m = _model(2)
    x = jax.random.uniform(KEY, (1, 8, 10, 3), minval=-1, maxval=1)
    p = m.init(KEY, x)["params"]
    out = m.apply({"params": p}, x)
    out2, feat = m.apply({"params": p}, x, return_trunk=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert feat.shape == (1, 8, 10, 8)
    # phase-tail graph agrees too
    mp = _model(2, phase_tail=True)
    out3, feat3 = mp.apply({"params": p}, x, return_trunk=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(feat), np.asarray(feat3))


def test_distill_step_reduces_loss():
    teacher = _model(4)
    hw = (16, 16)
    x = jnp.zeros((1, *hw, 3))
    tp = teacher.init(KEY, x)["params"]
    student = _model(2)
    sp = student_params_from_teacher(tp, 2)
    import optax

    # gentle lr: the teacher-subset init is already close, and a 4-block
    # random teacher's function is rough — 1e-3 Adam overshoots in the
    # first few steps (eval PSNR drops before recovering)
    state = create_generator_state(student, KEY, x, tx=optax.adam(2e-4))
    state = state.replace(params=sp)

    teacher_fwd = lambda tp, x: teacher.apply({"params": tp}, x,
                                              return_trunk=True)
    step = make_distill_step(student, teacher_fwd, hw, batch=2, seed=1)
    pool = jax.random.uniform(jax.random.PRNGKey(5), (3, *hw, 3),
                              minval=-1, maxval=1)
    # deterministic progress metric: student-vs-teacher PSNR on the
    # FIXED pool frames (per-step losses ride the augment stream — batch
    # noise, especially the synth-frame draws, swamps a 16-step delta)
    ev = make_eval_psnr(student, lambda p, x: teacher.apply({"params": p}, x))
    before = float(ev(state.params, tp, pool))
    state, m0 = step(state, tp, pool)
    assert np.isfinite(float(m0["loss"]))
    for _ in range(15):
        state, m = step(state, tp, pool)
    assert np.isfinite(float(m["psnr"]))
    after = float(ev(state.params, tp, pool))
    assert after > before, (before, after)


def test_eval_psnr_perfect_match_is_large():
    teacher = _model(3)
    x = jax.random.uniform(KEY, (2, 8, 8, 3), minval=-1, maxval=1)
    tp = teacher.init(KEY, x)["params"]
    ev = make_eval_psnr(teacher, teacher)
    psnr = float(ev(tp, tp, x))
    assert psnr > 100  # identical params -> identical outputs


def test_trunk_tail_walk_matches_model_apply():
    """trunk_walk + tail_walk must reproduce UpscalerOrig.apply
    (pixel tail, S-blocked head) over the same params tree."""
    from video_cycle_gan_upscaling_tpu.train.distill import (
        tail_walk,
        trunk_walk,
    )

    m = UpscalerOrig(kernel_size=3, filters=8, upscale_factor=2,
                     res_block_num=3, dtype=jnp.float32, head_block=2)
    x = jax.random.uniform(KEY, (2, 8, 12, 3), minval=-1, maxval=1)
    p = m.init(KEY, x)["params"]
    ref = m.apply({"params": p}, x)
    trunk, streams = trunk_walk(p, x, 3, dtype=jnp.float32,
                                collect_streams=True)
    out = tail_walk(p, trunk, 2, dtype=jnp.float32, head_block=2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5)
    assert len(streams) == 3
    # streams differ from each other (they really are per-block taps)
    assert float(jnp.mean((streams[0] - streams[2]) ** 2)) > 0


def test_fake_quant_act_ste_and_values():
    from video_cycle_gan_upscaling_tpu.train.distill import fake_quant_act

    z = jnp.asarray([[-1.0, 0.01, 0.5], [2.0, -0.3, 0.26]], jnp.float32)
    s = jnp.asarray([127.0, 127.0 / 2.0, 254.0], jnp.float32)
    q = fake_quant_act(z, s)
    ref = np.clip(np.round(np.asarray(z) * np.asarray(s)), -127, 127) \
        / np.asarray(s)
    np.testing.assert_allclose(np.asarray(q), ref, rtol=1e-6)
    # identity STE: gradient of sum(fq) w.r.t. z is all-ones
    g = jax.grad(lambda zz: jnp.sum(fake_quant_act(zz, s)))(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(ref))


def test_fake_quant_kernel_scale_fold():
    from video_cycle_gan_upscaling_tpu.train.distill import (
        fake_quant_kernel,
    )

    w = jax.random.normal(KEY, (3, 3, 4, 8), jnp.float32) * 0.1
    s_in = jnp.asarray([1.0, 2.0, 4.0, 8.0]) * 127.0
    qw = fake_quant_kernel(w, s_in)
    assert qw.shape == w.shape
    # error bounded by one rounding step of the folded grid per entry
    wf = np.asarray(w) / np.asarray(s_in)[None, None, :, None]
    amax = np.abs(wf).max(axis=(0, 1, 2))
    step = amax / 127.0
    err = np.abs(np.asarray(qw) - np.asarray(w))
    bound = (step[None, None, None, :] * np.asarray(s_in)[None, None, :, None])
    assert (err <= 0.5 * bound + 1e-7).all()
    g = jax.grad(lambda ww: jnp.sum(fake_quant_kernel(ww, s_in)))(w)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(w)))


def test_qat_walk_with_scales_runs_and_differs():
    from video_cycle_gan_upscaling_tpu.train.distill import (
        qat_calibrate,
        trunk_walk,
    )

    m = UpscalerOrig(kernel_size=3, filters=8, upscale_factor=2,
                     res_block_num=2, dtype=jnp.float32)
    x = jax.random.uniform(KEY, (1, 8, 8, 3), minval=-1, maxval=1)
    p = m.init(KEY, x)["params"]
    qset = frozenset(range(3))  # both blocks + prefinal
    scales = qat_calibrate(p, x, 2, qset, dtype=jnp.float32)
    assert set(scales) == {"pre_0", "post_0", "pre_1", "post_1",
                           "prefinal"}
    t_bf, _ = trunk_walk(p, x, 2, dtype=jnp.float32)
    t_q, _ = trunk_walk(p, x, 2, dtype=jnp.float32, qset=qset,
                        scales=scales)
    d = float(jnp.mean((t_bf - t_q) ** 2))
    assert 0 < d < 1e-2  # quantized differs, but is a small perturbation


def test_walk_distill_step_reduces_loss():
    import optax

    from video_cycle_gan_upscaling_tpu.train.distill import (
        make_walk_distill_step,
    )
    from video_cycle_gan_upscaling_tpu.train.state import TrainState

    hw = (16, 16)
    teacher = _model(4)
    x = jnp.zeros((1, *hw, 3))
    tp = teacher.init(KEY, x)["params"]
    sp = student_params_from_teacher(tp, 2)
    student = _model(2)
    state = TrainState.create(apply_fn=student.apply, params=sp,
                              tx=optax.adam(1e-3))
    step = make_walk_distill_step(2, 4, 2, hw, batch=2,
                                  dtype=jnp.float32, head_block=2, seed=3)
    pool = jax.random.uniform(jax.random.PRNGKey(5), (3, *hw, 3),
                              minval=-1, maxval=1)
    hist = []
    for _ in range(16):
        state, m = step(state, tp, pool)
        hist.append(float(m["loss"]))
    # per-step batches are freshly augmented -> noisy; compare windows
    assert np.all(np.isfinite(hist))
    assert np.mean(hist[-4:]) < np.mean(hist[1:5])
    for k in ("loss_out", "loss_feat", "loss_hint"):
        assert np.isfinite(float(m[k])), k


def test_tail_walk_fq_small_perturbation_and_grad():
    """Tail QAT sim: fake-quantized tail output is a small perturbation
    of the clean tail, and gradients flow to the tail weights."""
    from video_cycle_gan_upscaling_tpu.train.distill import (
        qat_calibrate_tail,
        tail_walk,
        trunk_walk,
    )

    m = _model(2)
    x = jax.random.uniform(KEY, (1, 16, 16, 3), minval=-1, maxval=1)
    p = m.init(KEY, x)["params"]
    fq = qat_calibrate_tail(p, x, 2, 2, dtype=jnp.float32)
    assert set(fq) == {"tail_in", "up_0"}
    trunk, _ = trunk_walk(p, x, 2, dtype=jnp.float32)
    clean = tail_walk(p, trunk, 2, dtype=jnp.float32)
    quant = tail_walk(p, trunk, 2, dtype=jnp.float32, fq_scales=fq)
    d = float(jnp.mean((clean - quant) ** 2))
    assert 0 < d < 1e-2, d

    def loss(params):
        t, _ = trunk_walk(params, x, 2, dtype=jnp.float32)
        return jnp.mean(tail_walk(params, t, 2, dtype=jnp.float32,
                                  fq_scales=fq) ** 2)

    g = jax.grad(loss)(p)
    gk = g["upscale_0"]["conv_transp"]["kernel"]
    assert np.isfinite(np.asarray(gk)).all()
    assert float(jnp.max(jnp.abs(gk))) > 0


def test_walk_distill_step_with_tail_fq_runs():
    import optax

    from video_cycle_gan_upscaling_tpu.train.distill import (
        make_walk_distill_step,
        qat_calibrate_tail,
    )
    from video_cycle_gan_upscaling_tpu.train.state import TrainState

    hw = (16, 16)
    teacher = _model(4)
    x = jnp.zeros((1, *hw, 3))
    tp = teacher.init(KEY, x)["params"]
    sp = student_params_from_teacher(tp, 2)
    cal = jax.random.uniform(jax.random.PRNGKey(9), (1, *hw, 3),
                             minval=-1, maxval=1)
    fq = qat_calibrate_tail(sp, cal, 2, 2, dtype=jnp.float32)
    student = _model(2)
    state = TrainState.create(apply_fn=student.apply, params=sp,
                              tx=optax.adam(1e-3))
    step = make_walk_distill_step(2, 4, 2, hw, batch=2, tail_fq=fq,
                                  dtype=jnp.float32, head_block=2, seed=4)
    pool = jax.random.uniform(jax.random.PRNGKey(5), (3, *hw, 3),
                              minval=-1, maxval=1)
    hist = []
    for _ in range(12):
        state, m = step(state, tp, pool)
        hist.append(float(m["loss"]))
    assert np.all(np.isfinite(hist))
    assert np.mean(hist[-4:]) < np.mean(hist[:4])
