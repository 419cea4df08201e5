"""Frame IO tests: image-dir sources/sinks, pure-Python y4m container
roundtrip, ffmpeg gating, and the upscale_clip pipeline."""

import numpy as np
import pytest
from PIL import Image

from video_cycle_gan_upscaling_tpu.video import io as vio


def _frames(n=3, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1, (h, w, 3)).astype(np.float32) for _ in range(n)]


def test_image_dir_roundtrip(tmp_path):
    sink = vio.ImageDirSink(str(tmp_path / "out"), ext=".png")
    frames = _frames()
    for f in frames:
        sink.write(f)
    src = vio.ImageDirSource(str(tmp_path / "out"), ext=".png")
    assert len(src) == 3
    back = list(src)
    # png is lossless modulo uint8 quantization
    np.testing.assert_allclose(back[0], frames[0], atol=1 / 127.5)


def test_y4m_roundtrip(tmp_path):
    path = str(tmp_path / "clip.y4m")
    frames = _frames(4)
    sink = vio.Y4mSink(path, (24, 32), fps=25)
    for f in frames:
        sink.write(f)
    sink.close()
    src = vio.Y4mSource(path)
    assert (src.height, src.width) == (24, 32)
    back = list(src)
    assert len(back) == 4
    # YUV444 full-range roundtrip: small quantization error
    np.testing.assert_allclose(back[0], frames[0], atol=0.03)


def test_y4m_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.y4m"
    p.write_bytes(b"NOTY4M stuff\n")
    with pytest.raises(ValueError):
        vio.Y4mSource(str(p))


def test_ffmpeg_gated():
    if vio.have_ffmpeg():
        pytest.skip("ffmpeg exists here")
    with pytest.raises(RuntimeError):
        vio.FfmpegSource("x.mp4", (10, 10))
    with pytest.raises(RuntimeError):
        vio.FfmpegSink("x.mp4", (10, 10))


def test_open_source_dispatch(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    Image.new("RGB", (8, 8)).save(d / "f.jpg")
    assert isinstance(vio.open_source(str(d)), vio.ImageDirSource)
    sink = vio.Y4mSink(str(tmp_path / "c.y4m"), (8, 8))
    sink.write(np.zeros((8, 8, 3), np.float32))
    sink.close()
    assert isinstance(vio.open_source(str(tmp_path / "c.y4m")), vio.Y4mSource)


def test_upscale_clip_stream_matches_per_frame(tmp_path):
    """Streaming chunked dispatch (uint8 in/out, lax.scan over chunks,
    padded tail superbatch) produces the same frames as the per-frame
    loop — including when the frame count is not a multiple of the
    superbatch size."""
    from video_cycle_gan_upscaling_tpu.ops.nn import resize_nearest
    from video_cycle_gan_upscaling_tpu.video.infer import (
        upscale_clip,
        upscale_clip_stream,
    )

    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(7):  # 7 frames, superbatch 2x2=4 -> one padded tail
        arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"f_{i}.png")

    common = dict(frame_hw=(12, 16), tile_hw=(12, 16), overlap=2,
                  upscale_factor=2)
    apply_fn = lambda p, x: resize_nearest(x, 2)
    sink_a = vio.ImageDirSink(str(tmp_path / "a"), ext=".png")
    res_a = upscale_clip(apply_fn, {}, vio.ImageDirSource(str(d), ".png"),
                         sink_a, **common)
    sink_b = vio.ImageDirSink(str(tmp_path / "b"), ext=".png")
    res_b = upscale_clip_stream(apply_fn, {},
                                vio.ImageDirSource(str(d), ".png"), sink_b,
                                chunk_frames=2, chunks_per_dispatch=2,
                                **common)
    assert res_a["frames"] == res_b["frames"] == 7
    outs_a = sorted((tmp_path / "a").iterdir())
    outs_b = sorted((tmp_path / "b").iterdir())
    assert len(outs_a) == len(outs_b) == 7
    for fa, fb in zip(outs_a, outs_b):
        a = np.asarray(Image.open(fa))
        b = np.asarray(Image.open(fb))
        np.testing.assert_array_equal(a, b)
    assert res_b["first_frame"].dtype == np.uint8


def test_upscale_clip_pipeline(tmp_path):
    # nearest-neighbor "generator": end-to-end clip path incl. prefetch
    from video_cycle_gan_upscaling_tpu.ops.nn import resize_nearest
    from video_cycle_gan_upscaling_tpu.video.infer import upscale_clip

    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        arr = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"f_{i}.jpg", quality=95)
    sink = vio.ImageDirSink(str(tmp_path / "out"), ext=".png")
    res = upscale_clip(lambda p, x: resize_nearest(x, 4), {},
                       vio.ImageDirSource(str(d)), sink,
                       frame_hw=(12, 16), tile_hw=(8, 8), overlap=2,
                       upscale_factor=4)
    assert res["frames"] == 3
    outs = sorted((tmp_path / "out").iterdir())
    assert len(outs) == 3
    assert Image.open(outs[0]).size == (64, 48)
