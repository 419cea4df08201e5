"""Coverage for utils: profiling timer, model summary, json codec, config."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.utils.config import RunConfig, TrainConfig
from video_cycle_gan_upscaling_tpu.utils.json_codec import ArtifactEncoder
from video_cycle_gan_upscaling_tpu.utils.profiling import StepTimer
from video_cycle_gan_upscaling_tpu.utils.summary import (
    param_count,
    summarize_params,
    write_summary,
)


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=2)
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert t.timed_steps == 3
    assert t.steps_per_sec > 0
    s = t.summary(items_per_step=4)
    assert s["items_per_sec"] == pytest.approx(4 * s["steps_per_sec"])


def test_param_summary(tmp_path):
    params = {"block": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
              "head": {"kernel": jnp.zeros((1, 1, 8, 3))}}
    assert param_count(params) == 3 * 3 * 4 * 8 + 8 + 24
    text = summarize_params(params, "tiny")
    assert "TOTAL" in text and "block/kernel" in text
    write_summary(str(tmp_path / "s.txt"), params)
    assert (tmp_path / "s.txt").read_text().count("kernel") >= 2


def test_artifact_encoder_types():
    import pandas as pd

    payload = {
        "df": pd.DataFrame({"a": [1, 2]}),
        "series": pd.Series([3, 4]),
        "npint": np.int64(7),
        "npfloat": np.float32(0.5),
        "arr": np.arange(3),
        "jax": jnp.ones((2,)),
    }
    out = json.loads(json.dumps(payload, cls=ArtifactEncoder))
    assert out["df"] == [{"a": 1}, {"a": 2}]
    assert out["series"] == [3, 4]
    assert out["npint"] == 7
    assert out["arr"] == [0, 1, 2]
    assert out["jax"] == [1.0, 1.0]


def test_config_validation_and_naming():
    with pytest.raises(ValueError):
        RunConfig(train=TrainConfig(downscale_factor=3))
    cfg = RunConfig(family="gan")
    assert cfg.prefix.startswith("gan_orig_vgg-only_simple-512_wasserstein")
    cfg2 = RunConfig(family="mini", output_prefix="custom")
    assert cfg2.prefix == "custom"


def test_config_roundtrip(tmp_path):
    cfg = RunConfig(family="cgc", subdir="x")
    cfg.save(str(tmp_path / "p.json"), extra={"train_set": ["a.jpg"]})
    loaded = RunConfig.load(str(tmp_path / "p.json"))
    assert loaded.family == "cgc" and loaded.subdir == "x"
    assert loaded.prefix == cfg.prefix


def test_device_op_table_aggregates_synthetic_trace(tmp_path):
    """device_op_table: parses a trace.json.gz, selects only the device
    pid's 'XLA Ops' thread, sums durations per op across repeats, and
    sorts descending."""
    import gzip
    import json

    from video_cycle_gan_upscaling_tpu.utils.profiling import device_op_table

    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},  # host thread with same name
        # two iterations of op a (device), one of op b, one host op
        {"ph": "X", "pid": 3, "tid": 7, "name": "a", "dur": 2000,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "10", "source": "x.py:1"}},
        {"ph": "X", "pid": 3, "tid": 7, "name": "a", "dur": 4000,
         "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "pid": 3, "tid": 7, "name": "b", "dur": 1000,
         "args": {}},
        {"ph": "X", "pid": 9, "tid": 1, "name": "host_op", "dur": 9999999,
         "args": {}},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": ev}, f)
    rows = device_op_table(str(tmp_path), iters=2)
    assert [r["name"] for r in rows] == ["a", "b"]
    assert abs(rows[0]["ms"] - 3.0) < 1e-9  # (2000+4000)us / 2 iters
    assert rows[0]["hlo_category"] == "convolution fusion"
    assert rows[0]["source"] == "x.py:1"
    assert abs(rows[1]["ms"] - 0.5) < 1e-9
