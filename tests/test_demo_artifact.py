"""Golden test for the committed demo-frame artifact (docs/demo/).

The artifact reproduces the reference's example_frame_test.ipynb demo
(BtoA_00286.jpg crop (0,0,480,270) -> x4 -> 1080p) with a checkpoint
trained on TPU (scripts/convergence_and_demo.py). This test replays the
committed generator on the committed small golden input and checks the
committed output still matches — guarding checkpoint format, model
reconstruction, and forward numerics.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

DEMO = os.path.join(os.path.dirname(__file__), "..", "docs", "demo")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO, "generator_params.msgpack")),
    reason="demo artifact not built yet (scripts/convergence_and_demo.py)")


def test_golden_demo_forward_matches_committed_output():
    from flax import serialization

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.ops.codec import image_to_array
    from video_cycle_gan_upscaling_tpu.train import create_generator_state

    cfg = json.load(open(os.path.join(DEMO, "model_config.json")))
    model = UpscalerOrig(kernel_size=cfg["kernel_size"],
                         filters=cfg["filters"],
                         upscale_factor=cfg["upscale_factor"],
                         res_block_num=cfg["res_block_num"],
                         norm=cfg["norm"], dtype=jnp.bfloat16,
                         phase_tail=True)
    x = image_to_array(Image.open(
        os.path.join(DEMO, "golden_input_96x128.png")))[None]
    state = create_generator_state(model, jax.random.PRNGKey(0), x)
    with open(os.path.join(DEMO, "generator_params.msgpack"), "rb") as f:
        params = serialization.from_bytes(state.params, f.read())

    y = model.apply({"params": params}, jnp.asarray(x))[0]
    got = np.asarray((jnp.clip(y, -1, 1) + 1) * 127.5, np.float32)
    ref = np.asarray(Image.open(
        os.path.join(DEMO, "golden_output_384x512.png")), np.float32)
    assert got.shape == ref.shape
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr > 40.0, psnr


def test_demo_metrics_recorded():
    m = json.load(open(os.path.join(DEMO, "metrics.json")))
    # geometry anchor: our bicubic must closely match the reference's
    # stored bicubic baseline (ukiyo_lowres.jpg) — proves the crop/scale
    # reproduction is exact up to JPEG
    assert m["psnr_our_bicubic_vs_ref_stored_bicubic"] > 40.0
    assert m["steps"] >= 3000


def test_demo_generator_params_loadable_both_factors():
    """The committed trained checkpoint drives the flagship model at x4
    and its x2 subset (upscale_1 dropped) — the bench teacher paths
    (utils/demo_assets.py)."""
    import jax.numpy as jnp

    from video_cycle_gan_upscaling_tpu.models import UpscalerOrig
    from video_cycle_gan_upscaling_tpu.utils.demo_assets import (
        load_demo_generator_params,
    )

    p4 = load_demo_generator_params(4)
    assert p4 is not None and "upscale_1" in p4
    p2 = load_demo_generator_params(2)
    assert "upscale_1" not in p2 and "upscale_0" in p2
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    m2 = UpscalerOrig(kernel_size=5, filters=64, upscale_factor=2,
                      res_block_num=16, dtype=jnp.float32)
    out = m2.apply({"params": p2}, x)
    assert out.shape == (1, 16, 16, 3)
    assert load_demo_generator_params(8) is None
