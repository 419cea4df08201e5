"""bench.py protocol invariants (the driver-recorded artifact).

The benchmark itself needs a TPU; these pin the cheap protocol pieces a
refactor could silently break: the budget-derived gate constant, the
held-out frame set, the calibration batch, and the fastest-first
ordering that protects the headline under a wall-clock cut."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_gate_is_budget_derived():
    # Q >= R - 10*log10(10^(B/10) - 1) with R=30, B=0.1 -> 46.33 dB
    assert abs(bench.TURBO_PSNR_GATE - 46.33) < 0.01
    # end-to-end delta at exactly the gate == the budget
    delta = 10 * np.log10(
        1 + 10 ** ((bench.R_TRAINED_DB - bench.TURBO_PSNR_GATE) / 10))
    assert abs(delta - bench.BUDGET_DB) < 1e-6


def test_eval_frames_exist_and_are_disjoint_from_calibration():
    demo = os.path.join(os.path.dirname(bench.__file__), "docs", "demo")
    assert len(bench.EVAL_FRAMES) >= 3
    for name in bench.EVAL_FRAMES:
        assert os.path.exists(os.path.join(demo, name)), name
        assert not name.startswith("input"), (
            "calibration content must stay out of the gate set")


def test_cal_batch_shapes(monkeypatch):
    hw = (24, 32)
    cal = bench._cal_batch(hw)
    assert cal.shape == (1, *hw, 3)
    monkeypatch.setenv("VCGU_CAL_AUG", "1")
    cal = bench._cal_batch(hw)
    assert cal.shape[0] == 3 and cal.shape[1:] == (*hw, 3)


def test_speed_rank_orders_fastest_first():
    class R:
        def __init__(self, blocks, quant, head_quant, tail_quant):
            self.res_block_num = blocks
            self.quant = quant
            self.head_quant = head_quant
            self.tail_quant = tail_quant

    runners = {
        "stu6-bf16": (R(6, False, False, False), None),
        "stu8-int8": (R(8, True, True, True), None),
        "int8": (R(16, True, True, True), None),
        "tail8": (R(16, False, True, True), None),
        "i8tail": (R(16, False, False, True), None),
        "bf16": (R(16, False, False, False), None),
    }
    order = sorted(runners, key=lambda t: bench._speed_rank(t, runners))
    # fewer blocks first; within a block count, deeper quant first,
    # bf16 last — so a budget cut keeps the likely-headline modes
    assert order[0] == "stu6-bf16"
    assert order[1] == "stu8-int8"
    assert order[-1] == "bf16"
    assert order.index("int8") < order.index("tail8") < order.index("bf16")
    assert order.index("tail8") < order.index("i8tail")
