"""Training-loop harness + orbax checkpoint/resume tests (SURVEY.md §5.3-5.5)."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from video_cycle_gan_upscaling_tpu.losses import make_content_loss_per_example
from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
from video_cycle_gan_upscaling_tpu.train import (
    create_generator_state,
    make_supervised_step,
)
from video_cycle_gan_upscaling_tpu.train.checkpoint import CheckpointManager
from video_cycle_gan_upscaling_tpu.train.loop import run_training_loop
from video_cycle_gan_upscaling_tpu.utils.logging import Ewma, LossLog, ProgressTracker

KEY = jax.random.PRNGKey(0)
LR = jax.random.uniform(KEY, (1, 8, 8, 3), minval=-1, maxval=1)
HR = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3), minval=-1, maxval=1)


def _tiny_state():
    model = UpscalerOrig(res_block_num=1, filters=8, kernel_size=3)
    return create_generator_state(model, KEY, LR)


def test_ewma_matches_reference_formula():
    e = Ewma(0.01)
    vals = [1.0, 2.0, 3.0]
    agg = 0.0
    for v in vals:
        agg = 0.99 * agg + 0.01 * v  # train.py:222
        assert e.update(v) == agg


def test_loss_log_tsv(tmp_path):
    path = str(tmp_path / "losses.txt")
    log = LossLog(path, ["batch", "loss", "agg_loss"])
    log.append({"batch": 0, "loss": 1.5, "agg_loss": 0.015})
    log.append({"batch": 1, "loss": 0.5, "agg_loss": 0.0199})
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "batch\tloss\tagg_loss"
    assert lines[1].split("\t")[0] == "0"
    assert len(lines) == 3


def test_training_loop_artifacts(tmp_path):
    state = _tiny_state()
    step = make_supervised_step(make_content_loss_per_example("mse"))
    log = LossLog(str(tmp_path / "losses.txt"), ["batch", "loss", "agg_loss"])
    best_log = LossLog(str(tmp_path / "best.txt"), ["batch", "loss", "agg_loss"])
    progress = ProgressTracker(str(tmp_path / "progress.json"))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    batches = itertools.repeat((LR, HR))

    state, last = run_training_loop(
        step, state, batches, 8,
        best_metric="loss", model_save_freq=3,
        loss_log=log, best_log=best_log, progress=progress, ckpt=ckpt,
    )
    assert int(state.step) == 8
    rows = open(tmp_path / "losses.txt").read().strip().split("\n")
    assert len(rows) == 9  # header + 8 batches
    # periodic checkpoints at 0, 3, 6
    assert ckpt.latest_step() == 6
    # loss decreases on a fixed batch -> best saved after warmup (b > 3)
    assert os.path.exists(ckpt.best_path)
    import json

    prog = json.load(open(tmp_path / "progress.json"))
    assert prog["best_model"] is not None
    assert len(prog["saved_models"]) == 3


def test_checkpoint_roundtrip_and_resume(tmp_path):
    state = _tiny_state()
    step = make_supervised_step(make_content_loss_per_example("mse"))
    for _ in range(3):
        state, _ = step(state, LR, HR)
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(3, state)

    # restore into a freshly-initialized state of the same structure
    target = _tiny_state()
    restored = ckpt.restore(target)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues bit-exactly vs uninterrupted training
    cont_a, _ = step(restored, LR, HR)
    cont_b, _ = step(state, LR, HR)
    for a, b in zip(jax.tree_util.tree_leaves(cont_a.params),
                    jax.tree_util.tree_leaves(cont_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_gc(tmp_path):
    state = _tiny_state()
    ckpt = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for s in (0, 1, 2, 3):
        ckpt.save(s, state)
    assert ckpt._steps() == [2, 3]


def test_pipelined_loop_matches_sync(tmp_path):
    """The pipelined metric fetch (default) logs the same rows, EWMAs,
    and save decisions as the sync fetch-every-step loop — the one-step
    lag changes WHEN metrics cross the link, not what is processed."""
    import json

    step = make_supervised_step(make_content_loss_per_example("mse"))
    fields = ["batch", "loss", "agg_loss"]
    outs = {}
    for tag, sync in (("pipe", False), ("sync", True)):
        d = tmp_path / tag
        d.mkdir()
        log = LossLog(str(d / "losses.txt"), fields)
        progress = ProgressTracker(str(d / "progress.json"))
        ckpt = CheckpointManager(str(d / "ckpt"))
        state, last = run_training_loop(
            step, _tiny_state(), itertools.repeat((LR, HR)), 7,
            best_metric="loss", model_save_freq=3, loss_log=log,
            progress=progress, ckpt=ckpt, sync_metrics=sync)
        assert int(state.step) == 7
        prog = json.load(open(d / "progress.json"))
        outs[tag] = (open(d / "losses.txt").read(),
                     ckpt.latest_step(),
                     [m["batch"] for m in prog["saved_models"]],
                     last["batch"])
    assert outs["pipe"] == outs["sync"]
