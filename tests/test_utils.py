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
