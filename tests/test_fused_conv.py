"""Fused conv+instance-norm kernel: exactness of every variant against an
HR-space lax.conv oracle (pallas interpret mode on CPU + the pure-XLA
fallback), plus end-to-end FastOrigRunner parity with UpscalerOrig."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from video_cycle_gan_upscaling_tpu.ops.pallas import fused_conv as fc
from video_cycle_gan_upscaling_tpu.ops.pallas import norms as pnorms

N, H, W, C = 2, 12, 16, 8
PACK = 2
WP, CP = W // PACK, C * PACK
K = 5
KEY = jax.random.PRNGKey(0)


def _mk(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale)


X = _mk(KEY, (N, H, W, C), 0.7)
WK = _mk(jax.random.PRNGKey(1), (K, K, C, C), 0.2)
RES = _mk(jax.random.PRNGKey(2), (N, H, W, C), 0.5)
SC = _mk(jax.random.PRNGKey(3), (N, C), 0.3) + 1.0
SH = _mk(jax.random.PRNGKey(4), (N, C), 0.2)
AL = jnp.abs(_mk(jax.random.PRNGKey(5), (C,), 0.2))


def _pack(v):
    return v.reshape(N, H, WP, CP)


def _hr_oracle(x, w, pre, act, scale, shift, alpha, res):
    """Reference in HR space: pre-op -> SAME conv -> stats."""
    z = x.astype(jnp.float32)
    if pre != "none":
        z = z * scale[:, None, None, :] + shift[:, None, None, :]
        if act == "prelu":
            z = jnp.where(z < 0, alpha * z, z)
        if pre == "affine_res":
            z = z + res
    y = lax.conv_general_dilated(z, w, (1, 1), "SAME",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    stats = jnp.stack([jnp.sum(y, axis=(1, 2)),
                       jnp.sum(y * y, axis=(1, 2))], axis=1)
    return z, y, stats


def _unpack_scale(v):
    return jnp.tile(v, (1, PACK))


@pytest.mark.parametrize("interpret", [True, False])
@pytest.mark.parametrize("variant", ["none", "affine_act", "affine_res"])
def test_fused_variants_match_oracle(variant, interpret):
    w5, pads = fc.pack_conv_kernel(WK, PACK)
    kw = dict(pads=pads, interpret=interpret)
    if variant == "none":
        out = fc.fused_conv_stats(_pack(X), w5, **kw)
        y, stats = out
        hs = None
    elif variant == "affine_act":
        out = fc.fused_conv_stats(_pack(X), w5, pre="affine_act",
                                  act="prelu", scale=_unpack_scale(SC),
                                  shift=_unpack_scale(SH),
                                  alpha=jnp.tile(AL, PACK), **kw)
        y, stats = out
        hs = None
    else:
        out = fc.fused_conv_stats(_pack(X), w5, pre="affine_res",
                                  scale=_unpack_scale(SC),
                                  shift=_unpack_scale(SH),
                                  res=_pack(RES), **kw)
        y, hs, stats = out

    z_ref, y_ref, st_ref = _hr_oracle(
        X, WK, variant, "prelu" if variant == "affine_act" else "none",
        SC, SH, AL, RES)

    y_hr = np.asarray(y, np.float32).reshape(N, H, W, C)
    np.testing.assert_allclose(y_hr, np.asarray(y_ref), rtol=0.05, atol=0.05)
    # fold packed stats back to per-channel and compare
    s1 = np.asarray(stats[:, 0]).reshape(N, PACK, C).sum(1)
    s2 = np.asarray(stats[:, 1]).reshape(N, PACK, C).sum(1)
    np.testing.assert_allclose(s1, np.asarray(st_ref[:, 0]), rtol=0.02,
                               atol=0.5)
    np.testing.assert_allclose(s2, np.asarray(st_ref[:, 1]), rtol=0.02,
                               atol=0.5)
    if hs is not None:
        hs_hr = np.asarray(hs, np.float32).reshape(N, H, W, C)
        np.testing.assert_allclose(hs_hr, np.asarray(z_ref), rtol=0.02,
                                   atol=0.02)


@pytest.mark.parametrize("interpret", [True, False])
def test_fused_quant_matches_xla_emulation(interpret):
    """int8 path: pallas kernel == the XLA int-conv emulation exactly
    (same quantization), and close to the f32 conv."""
    w5q, pads = fc.pack_conv_kernel(WK, PACK, quant=True)
    args = dict(pre="affine_act", act="prelu", scale=_unpack_scale(SC),
                shift=_unpack_scale(SH), alpha=jnp.tile(AL, PACK),
                quant=True, pads=pads)
    y_p, st_p = fc.fused_conv_stats(_pack(X), w5q, interpret=interpret,
                                    **args)
    y_r, st_r = fc._reference(_pack(X), w5q, alpha=jnp.tile(AL, PACK),
                              scale=_unpack_scale(SC),
                              shift=_unpack_scale(SH), res=None,
                              pre="affine_act", act="prelu", quant=True,
                              pads=pads)
    np.testing.assert_allclose(np.asarray(y_p, np.float32),
                               np.asarray(y_r, np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st_p), np.asarray(st_r),
                               rtol=1e-6, atol=1e-3)


@pytest.mark.parametrize("variant", ["none", "affine_res"])
def test_partial_stats_mode_matches_revisit(variant):
    """stats_mode='partial' (per-step partial stats, fully parallel grid)
    returns the same summed [N,2,Cp] as the revisit accumulator."""
    w5, pads = fc.pack_conv_kernel(WK, PACK)
    kw = {} if variant == "none" else dict(
        pre="affine_res", scale=_unpack_scale(SC), shift=_unpack_scale(SH),
        res=_pack(RES))
    out_r = fc.fused_conv_stats(_pack(X), w5, pads=pads, interpret=True,
                                stats_mode="revisit", **kw)
    out_p = fc.fused_conv_stats(_pack(X), w5, pads=pads, interpret=True,
                                stats_mode="partial", **kw)
    for a, b in zip(out_r, out_p):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-4)


def test_stats_to_scale_shift_matches_instance_norm():
    w5, pads = fc.pack_conv_kernel(WK, PACK)
    y, stats = fc.fused_conv_stats(_pack(X), w5, pads=pads, interpret=True)
    g = _mk(jax.random.PRNGKey(6), (C,), 0.3) + 1.0
    b = _mk(jax.random.PRNGKey(7), (C,), 0.2)
    scale, shift = fc.stats_to_scale_shift(stats, g, b, PACK, H * W)
    y_hr = np.asarray(y, np.float32).reshape(N, H, W, C)
    got = y_hr * np.asarray(scale)[:, None, None, :C][..., :C] + \
        np.asarray(shift)[:, None, None, :C]
    from video_cycle_gan_upscaling_tpu.ops.nn import instance_norm

    ref = instance_norm(jnp.asarray(y_hr), g, b)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=0.02, atol=0.02)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("factor", [2, 4])
def test_fast_orig_runner_matches_model(quant, factor):
    """FastOrigRunner (interpret-mode kernels) vs UpscalerOrig.apply —
    factor 2 exercises the block0=2 tail, factor 4 the r=1-start tail."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    ref = model.apply(variables, x)

    pnorms.INTERPRET = True
    try:
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=factor, tile_hw=(12, 16),
                                quant=quant, dtype=jnp.float32)
        if factor == 2:
            assert runner.block0 == 2
        got = runner.apply(runner.qp, x)
    finally:
        pnorms.INTERPRET = False
    assert got.shape == ref.shape
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    if quant:
        # lossy int8 trunk: demand high PSNR instead of elementwise match
        mse = float(np.mean((np.asarray(got, np.float32)
                             - np.asarray(ref, np.float32)) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        assert psnr > 35.0, psnr
    else:
        assert float(err.max()) < 0.05, float(err.max())


@pytest.mark.parametrize("quant", [False, True])
def test_fast_orig_runner_apply_u8_matches_apply(quant):
    """apply_u8 (codec emit folded into the head epilogue) must equal
    unit_to_uint8(apply(...)) exactly for every tail variant."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner
    from video_cycle_gan_upscaling_tpu.ops.codec import unit_to_uint8

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=2,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)

    pnorms.INTERPRET = True
    try:
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=2, tile_hw=(12, 16),
                                quant=quant, dtype=jnp.float32)
        qp = runner.calibrate(runner.qp, x) if quant else runner.qp
        ref = unit_to_uint8(runner.apply(qp, x))
        got = runner.apply_u8(qp, x)
    finally:
        pnorms.INTERPRET = False
    assert got.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("quant",
                         [True, "tail", "tail8", "tail8:s1",
                          "mix:last1+s1"])
def test_fast_orig_runner_int8_tail(quant, factor):
    """Calibrated W8A8 tail (full-int8, hybrid-tail, all-int8-tail, and
    bf16-stage-0 'tail8:s1' modes, x2 and the chained x4 x-pack): still
    high-PSNR vs the reference model."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    ref = model.apply(variables, x)

    pnorms.INTERPRET = True
    try:
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=factor, tile_hw=(12, 16),
                                quant=quant, dtype=jnp.float32)
        assert runner.xpack_ready
        assert runner.tail_quant_ready
        assert runner.quant == (quant is True
                                or str(quant).startswith("mix"))
        qp = runner.calibrate(runner.qp, x)
        assert runner.tail_calibrated
        if str(quant).endswith(":s1") or str(quant).endswith("+s1"):
            # x4: bf16 stage-0 (no up0 int8 kernel, no s0 consumer);
            # x2: degenerates to the underlying tail8/mix mode
            assert runner.s1_only == (factor == 4)
            if factor == 4:
                assert "up0_w_q" not in qp and "tail_sm" in qp
        if quant in (True, "tail8", "tail8:s1", "mix:last1+s1"):
            # asymmetric head-input quantizer active by default
            assert runner.head_zp
            assert "tail_zp1" in qp and "final_b_map" in qp
            assert qp["final_b_map"].ndim == 4
        got = runner.apply(qp, x)
    finally:
        pnorms.INTERPRET = False
    assert got.shape == ref.shape
    mse = float(np.mean((np.asarray(got, np.float32)
                         - np.asarray(ref, np.float32)) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > (40.0 if quant == "tail" else
                   35.0 if quant in ("tail8", "tail8:s1", "mix:last1+s1")
                   else 30.0), (quant, psnr)


def test_head_zp_bias_map_interior_and_corner_oracle():
    """The zero-point bias map's interior equals bias + ws * (full-tap
    sum of w_q)·zp — computable WITHOUT any conv — and its corner entry
    equals the partial (in-bounds-taps-only) sum: validates the
    correction conv's pads/stride/lane-tiling against an independent
    numpy oracle."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=2,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    pnorms.INTERPRET = True
    try:
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=2, tile_hw=(12, 16),
                                quant="tail8", dtype=jnp.float32)
        assert runner.head_zp
        qp = runner.calibrate(runner.qp, x)
    finally:
        pnorms.INTERPRET = False
    zp_t = np.tile(np.asarray(qp["tail_zp1"], np.float64), 2)   # [8C]
    wq = np.asarray(qp["final_w_q"], np.float64)                # [6,4,8C,96]
    ws = np.asarray(qp["final_w_ws"], np.float64)
    bias = np.asarray(qp["final_b_c"], np.float64)
    m = np.asarray(qp["final_b_map"], np.float64)[0]
    full = (wq * zp_t[None, None, :, None]).sum((0, 1, 2))
    np.testing.assert_allclose(m[2, 2], bias + ws * full,
                               rtol=1e-5, atol=1e-4)
    # corner (0,0): head pads ((2,3), px) stride (2,2) -> only taps
    # ky>=2, kx>=px_l are in-bounds
    px_l = runner.final_px_q[0]
    part = (wq[2:, px_l:] * zp_t[None, None, :, None]).sum((0, 1, 2))
    np.testing.assert_allclose(m[0, 0], bias + ws * part,
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("quant", ["tail", "tail8"])
@pytest.mark.parametrize("pallas", [False, True])
def test_fast_orig_runner_exact_phase_up(quant, factor, pallas,
                                         monkeypatch):
    """VCGU_EXACT_UP=1: stage-1 as four exact-phase convs must match the
    pair-form tail to quantization-rounding tolerance (same linear map,
    independently quantized weights); VCGU_PHASE_UP=1 (the one-pass
    Pallas form) must match the XLA exact form bit-exactly (identical
    integer accumulation and f32 epilogue order)."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    ref = model.apply(variables, x)

    pnorms.INTERPRET = True
    try:
        monkeypatch.setenv("VCGU_EXACT_UP", "1")
        monkeypatch.setenv("VCGU_PHASE_UP", "1" if pallas else "0")
        # the phase_up Pallas form has no zero-point emit; disable the
        # asymmetric head quantizer so the XLA/pallas comparison (and
        # the cross-runner bit-exactness below) stay on identical math
        monkeypatch.setenv("VCGU_HEAD_ZP", "0")
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=factor, tile_hw=(12, 16),
                                quant=quant, dtype=jnp.float32)
        assert runner.up_exact
        assert runner.up_pallas == pallas
        qp = runner.calibrate(runner.qp, x)
        if pallas:
            assert "upx_taps_w" in qp
        got = runner.apply(qp, x)
        u8 = runner.apply_u8(qp, x)
    finally:
        pnorms.INTERPRET = False
    assert got.shape == ref.shape
    mse = float(np.mean((np.asarray(got, np.float32)
                         - np.asarray(ref, np.float32)) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > (40.0 if quant == "tail" else 35.0), (quant, psnr)
    from video_cycle_gan_upscaling_tpu.ops.codec import unit_to_uint8

    np.testing.assert_array_equal(np.asarray(u8),
                                  np.asarray(unit_to_uint8(got)))
    if pallas and quant == "tail8":
        # bit-exactness vs the XLA exact form (same quantized weights)
        monkeypatch.setenv("VCGU_PHASE_UP", "0")
        pnorms.INTERPRET = True
        try:
            r2 = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=factor, tile_hw=(12, 16),
                                quant=quant, dtype=jnp.float32)
            qp2 = r2.calibrate(r2.qp, x)
            got2 = r2.apply(qp2, x)
        finally:
            pnorms.INTERPRET = False
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(got2, np.float32))


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("quant", ["tail", "tail8"])
def test_fast_orig_runner_grouped_stage1_bitexact(quant, factor,
                                                  monkeypatch):
    """VCGU_GROUP_UP=1: stage-1 as TWO row-support-grouped union-window
    convs must match the four-conv exact-phase form BIT-exactly — the
    grouped int8 kernels are built from the same quantized per-phase
    kernels (structural zero padding changes no abs-max, hence no
    scale), and integer conv accumulation is exact. The hybrid ("tail")
    head runs f32 — its conv accumulates lanes in a different order, so
    it gets a tight float tolerance instead."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)

    outs = {}
    for grouped in (False, True):
        pnorms.INTERPRET = True
        try:
            monkeypatch.setenv("VCGU_EXACT_UP", "1")
            monkeypatch.setenv("VCGU_GROUP_UP", "1" if grouped else "0")
            runner = FastOrigRunner(variables["params"], res_block_num=2,
                                    upscale_factor=factor, tile_hw=(12, 16),
                                    quant=quant, dtype=jnp.float32)
            assert runner.up_exact
            assert (runner.up_groups is not None) == grouped
            qp = runner.calibrate(runner.qp, x)
            if grouped:
                assert "upg0_w_q" in qp and "upg1_w_q" in qp
                # union windows: 25 true taps inside 30 padded slots
                true_taps = sum(
                    int(np.sum(np.any(np.asarray(qp[f"upx{p}_w_q"]) != 0,
                                      axis=(2, 3))))
                    for p in range(4))
                slots = sum(g["uy"] * g["ux"] * 2
                            for g in runner.up_groups)
                assert true_taps <= 25 and slots == 30
            outs[grouped] = (runner.apply(qp, x), runner.apply_u8(qp, x))
        finally:
            pnorms.INTERPRET = False
    a = np.asarray(outs[True][0], np.float32)
    b = np.asarray(outs[False][0], np.float32)
    if quant == "tail8":  # integer accumulation: exact
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(outs[True][1]),
                                      np.asarray(outs[False][1]))
    else:  # f32 head: lane-summation order differs inside the conv
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
        assert np.mean(np.abs(np.asarray(outs[True][1], np.int32)
                              - np.asarray(outs[False][1], np.int32))
                       ) < 1e-3  # u8 rounding flips only at ties


@pytest.mark.parametrize("factor", [2, 4])
def test_fast_orig_runner_mixed_trunk(factor):
    """quant='mix:<spec>' (per-unit mixed-precision trunk + tail8 tail):
    the all-units mix is BIT-IDENTICAL to quant=True (same packing, same
    calibration refolds), and a partial mix quantizes only the named
    units and stays high-PSNR vs the reference model."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import (
        FastOrigRunner,
        parse_mix_spec,
    )

    assert parse_mix_spec("mix:last1", 2) == frozenset({2})
    assert parse_mix_spec("mix:first2", 2) == frozenset({0, 1})
    assert parse_mix_spec("mix:0,2", 2) == frozenset({0, 2})

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    ref = model.apply(variables, x)

    pnorms.INTERPRET = True
    try:
        mk = lambda q: FastOrigRunner(
            variables["params"], res_block_num=2, upscale_factor=factor,
            tile_hw=(12, 16), quant=q, dtype=jnp.float32)
        r_full = mk(True)
        r_all = mk("mix:last3")  # 2 blocks + prefinal = every unit
        assert r_all.trunk_qset == frozenset({0, 1, 2})
        qp_full = r_full.calibrate(r_full.qp, x)
        qp_all = r_all.calibrate(r_all.qp, x)
        assert set(qp_full) == set(qp_all)
        got_full = np.asarray(r_full.apply(qp_full, x), np.float32)
        got_all = np.asarray(r_all.apply(qp_all, x), np.float32)
        np.testing.assert_array_equal(got_all, got_full)

        r_mix = mk("mix:last1")  # prefinal conv only
        assert r_mix.quant and r_mix.head_quant and r_mix.tail_quant_ready
        assert r_mix.qp["w_prefinal"].dtype == jnp.int8
        assert r_mix.qp["w_post_0"].dtype != jnp.int8
        assert r_mix.qp["w_pre_0"].dtype != jnp.int8
        assert "qs_r_1" in r_mix.qp and "qs_a_0" not in r_mix.qp
        qp_mix = r_mix.calibrate(r_mix.qp, x)
        got = np.asarray(r_mix.apply(qp_mix, x), np.float32)
    finally:
        pnorms.INTERPRET = False
    assert got.shape == ref.shape
    mse = float(np.mean((got - np.asarray(ref, np.float32)) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    mse_f = float(np.mean((got_full - np.asarray(ref, np.float32)) ** 2))
    psnr_full = 10 * np.log10(4.0 / max(mse_f, 1e-12))
    # fewer quantized convs => at least as clean as the full-int8 trunk
    assert psnr > 35.0 and psnr >= psnr_full - 1.0, (psnr, psnr_full)


@pytest.mark.parametrize("spec", ["trunk", "trunk:last1"])
@pytest.mark.parametrize("factor", [2, 4])
def test_fast_orig_runner_trunk_only_mode(spec, factor):
    """quant='trunk[:SPEC]' = W8A8 trunk units + BF16 tail (the inverse
    of 'tail'/'tail8' — round-4 trained-weights finding: the tail
    dominates W8A8 error on trained statistics). The tail must stay
    bf16 (no tail scales in the calibrated qp) and quality must be
    bounded by trunk-quant error only."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=factor,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)
    ref = model.apply(variables, x)

    pnorms.INTERPRET = True
    try:
        runner = FastOrigRunner(variables["params"], res_block_num=2,
                                upscale_factor=factor, tile_hw=(12, 16),
                                quant=spec, dtype=jnp.float32)
        assert runner.quant and not runner.tail_quant
        assert not runner.tail_quant_ready and not runner.head_quant
        n_units = len(runner.trunk_qset)
        assert n_units == (3 if spec == "trunk" else 1)
        qp = runner.calibrate(runner.qp, x)
        assert "tail_s0" not in qp  # tail stays bf16
        got = runner.apply(qp, x)
    finally:
        pnorms.INTERPRET = False
    assert got.shape == ref.shape
    mse = float(np.mean((np.asarray(got, np.float32)
                         - np.asarray(ref, np.float32)) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 35.0, (spec, psnr)


def test_tail_clip_auto_selects_on_calibration_batch(monkeypatch):
    """tail_clip='auto' picks the clip ratio minimizing quant-vs-bf16
    MSE on the CALIBRATION batch (never held-out content) — on-batch
    quality must therefore be >= the un-clipped calibration's."""
    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.models.fast_infer import FastOrigRunner

    monkeypatch.delenv("VCGU_TAIL_CLIP", raising=False)
    model = UpscalerOrig(kernel_size=5, filters=8, upscale_factor=2,
                         res_block_num=2, dtype=jnp.float32, phase_tail=True)
    x = _mk(jax.random.PRNGKey(8), (1, 12, 16, 3), 0.5)
    variables = model.init(jax.random.PRNGKey(9), x)

    def psnr_of(qp, runner):
        ref = runner.apply(runner.qp, x)   # uncalibrated -> bf16 tail
        got = runner.apply(qp, x)
        mse = float(np.mean((np.asarray(got, np.float32)
                             - np.asarray(ref, np.float32)) ** 2))
        return 10 * np.log10(4.0 / max(mse, 1e-12))

    pnorms.INTERPRET = True
    try:
        r1 = FastOrigRunner(variables["params"], res_block_num=2,
                            upscale_factor=2, tile_hw=(12, 16),
                            quant="tail8", dtype=jnp.float32)
        qp1 = r1.calibrate(r1.qp, x, tail_clip=1.0)
        p_unclipped = psnr_of(qp1, r1)
        assert r1.tail_clip_selected == 1.0

        r2 = FastOrigRunner(variables["params"], res_block_num=2,
                            upscale_factor=2, tile_hw=(12, 16),
                            quant="tail8", dtype=jnp.float32)
        qp2 = r2.calibrate(r2.qp, x)  # auto
        p_auto = psnr_of(qp2, r2)
        assert r2.tail_clip_selected in (1.0, 0.85, 0.7, 0.55, 0.4)
    finally:
        pnorms.INTERPRET = False
    assert p_auto >= p_unclipped - 0.2, (p_auto, p_unclipped)
