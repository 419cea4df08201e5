"""Value-range codec parity tests (reference: data.py:253-277)."""

import numpy as np

from video_cycle_gan_upscaling_tpu.ops import codec


def test_uint8_roundtrip():
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    u = codec.uint8_to_unit(x)
    assert u.dtype == np.float32
    assert u.min() == -1.0 and u.max() == 1.0
    back = codec.unit_to_uint8(u)
    np.testing.assert_array_equal(back, x)


def test_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    u = codec.uint8_to_unit(x)
    np.testing.assert_allclose(u, (x / 127.5) - 1, atol=1e-6)
    # reference encode: np.uint8(np.around((a + 1) * 127.5))
    np.testing.assert_array_equal(
        codec.unit_to_uint8(u), np.uint8(np.around((u + 1) * 127.5))
    )


def test_jnp_path_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, size=(8, 8, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(codec.unit_to_uint8(jnp.asarray(a))), codec.unit_to_uint8(a)
    )


def test_images_to_batch():
    from PIL import Image

    imgs = [Image.new("RGB", (8, 6), (255, 0, 128)) for _ in range(3)]
    batch = codec.images_to_batch(imgs)
    assert batch.shape == (3, 6, 8, 3)
    np.testing.assert_allclose(batch[0, 0, 0], [1.0, -1.0, 128 / 127.5 - 1], atol=1e-6)
