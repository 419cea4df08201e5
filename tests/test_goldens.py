"""Golden-output regression tests (SURVEY.md §4 test plan): every
generator family with fixed seeds must keep producing the stored outputs
within a tight PSNR budget — catches silent semantic changes to the block
library (the methodology analog of the reference's stored
example_movie_frames JPEGs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_cycle_gan_upscaling_tpu.models import generators as G
from video_cycle_gan_upscaling_tpu.video.metrics import psnr

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "generators_v1.npz")

SPECS = {
    "orig": lambda: G.UpscalerOrig(res_block_num=2, filters=8, kernel_size=3),
    "skip_con": lambda: G.UpscalerSkipCon(res_block_num=2, filters=8, kernel_size=3),
    "attention": lambda: G.UpscalerAttention(res_block_num=2, filters=8, kernel_size=3),
    "incep": lambda: G.UpscalerIncepResnet(filters=16, a_block_num=1,
                                           b_block_num=1, c_block_num=1),
    "unetish": lambda: G.UpscalerUnetish(step_size=1, downscale_times=2,
                                         initial_filters=8),
    "unetish_add": lambda: G.UpscalerUnetishAdd(step_size=1, downscale_times=2,
                                                initial_filters=8),
    "cyclegan": lambda: G.CycleGanResnetGenerator(filters=8, res_block_num=2),
}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_generator_matches_golden(name):
    data = np.load(GOLDENS)
    x = jnp.asarray(data["input"])
    model = SPECS[name]()
    variables = model.init(jax.random.PRNGKey(7), x)
    y = model.apply(variables, x)
    golden = data[name]
    assert y.shape == golden.shape
    db = float(psnr(jnp.asarray(golden), y))
    assert db > 50.0, f"{name} drifted from golden: {db:.1f} dB"
