"""Frame IO: image-sequence dirs (reference parity), y4m containers, and
gated ffmpeg pipes.

The reference has no in-repo video decode — frames arrive pre-extracted as
JPEGs (example_movie_frames, SURVEY.md §3.3). Primary path here is the
same image-sequence convention; a pure-Python y4m reader/writer covers
container round-trips without external tools, and FfmpegSource/Sink use a
subprocess rawvideo pipe when an ``ffmpeg`` binary exists (gated — absent
in this image).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

from video_cycle_gan_upscaling_tpu.ops.codec import uint8_to_unit, unit_to_uint8

try:
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


# ---------------------------------------------------------------- image dirs
class ImageDirSource:
    """Sorted image-sequence reader -> float32 HWC frames in [-1,1]."""

    def __init__(self, directory: str, ext: str = ".jpg"):
        self.directory = directory
        self.files = sorted(f for f in os.listdir(directory) if f.endswith(ext))

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator[np.ndarray]:
        for f in self.files:
            img = Image.open(os.path.join(self.directory, f)).convert("RGB")
            yield uint8_to_unit(np.asarray(img, dtype=np.uint8))

    def iter_uint8(self) -> Iterator[np.ndarray]:
        """Raw uint8 frames (no [-1,1] detour) — the streaming clip path
        converts on device, so host->device traffic stays 1 byte/px."""
        for f in self.files:
            img = Image.open(os.path.join(self.directory, f)).convert("RGB")
            yield np.asarray(img, dtype=np.uint8)


class ImageDirSink:
    """Writes float [-1,1] frames as numbered JPEG/PNG files."""

    def __init__(self, directory: str, prefix: str = "frame",
                 ext: str = ".jpg", quality: int = 95):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.prefix = prefix
        self.ext = ext
        self.quality = quality
        self._idx = 0

    def write(self, frame: np.ndarray) -> str:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = unit_to_uint8(frame)
        return self.write_uint8(frame)

    def write_uint8(self, frame_u8: np.ndarray) -> str:
        path = os.path.join(self.directory, f"{self.prefix}_{self._idx:06d}{self.ext}")
        img = Image.fromarray(frame_u8)
        if self.ext in (".jpg", ".jpeg"):
            img.save(path, quality=self.quality)
        else:
            img.save(path)
        self._idx += 1
        return path

    def close(self):
        pass


# ---------------------------------------------------------------- y4m (RGB)
# Minimal YUV4MPEG2 support with C444 colorspace, full-range BT.601 matrix.
_Y4M_MAGIC = b"YUV4MPEG2"


def _rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]], np.float32)
    yuv = rgb.astype(np.float32) @ m.T
    yuv[..., 1:] += 128.0
    return np.clip(np.round(yuv), 0, 255).astype(np.uint8)


def _yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    y = yuv[..., 0].astype(np.float32)
    u = yuv[..., 1].astype(np.float32) - 128.0
    v = yuv[..., 2].astype(np.float32) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)


class Y4mSink:
    """Pure-Python y4m writer (C444): float [-1,1] HWC frames in."""

    def __init__(self, path: str, size_hw: Tuple[int, int], fps: int = 25):
        self.fh = open(path, "wb")
        h, w = size_hw
        self.fh.write(_Y4M_MAGIC + f" W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode())

    def write(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        u8 = frame if frame.dtype == np.uint8 else unit_to_uint8(frame)
        self.write_uint8(u8)

    def write_uint8(self, u8: np.ndarray) -> None:
        yuv = _rgb_to_yuv444(u8)
        self.fh.write(b"FRAME\n")
        # planar: Y plane, U plane, V plane
        for c in range(3):
            self.fh.write(yuv[..., c].tobytes())

    def close(self):
        self.fh.close()


class Y4mSource:
    """Pure-Python y4m reader (C444) -> float [-1,1] HWC frames."""

    def __init__(self, path: str):
        self.fh = open(path, "rb")
        header = self.fh.readline().strip().split(b" ")
        if header[0] != _Y4M_MAGIC:
            raise ValueError("not a y4m file")
        self.width = self.height = None
        colorspace = b"C420"
        for tok in header[1:]:
            if tok.startswith(b"W"):
                self.width = int(tok[1:])
            elif tok.startswith(b"H"):
                self.height = int(tok[1:])
            elif tok.startswith(b"C"):
                colorspace = tok
        if not colorspace.startswith(b"C444"):
            raise ValueError(f"only C444 supported, got {colorspace!r}")

    def __iter__(self) -> Iterator[np.ndarray]:
        for rgb in self.iter_uint8():
            yield uint8_to_unit(rgb)

    def iter_uint8(self) -> Iterator[np.ndarray]:
        plane = self.width * self.height
        while True:
            marker = self.fh.readline()
            if not marker:
                return
            if not marker.startswith(b"FRAME"):
                raise ValueError("corrupt y4m frame marker")
            raw = self.fh.read(3 * plane)
            if len(raw) < 3 * plane:
                return
            yuv = np.frombuffer(raw, np.uint8).reshape(3, self.height, self.width)
            yield _yuv444_to_rgb(np.moveaxis(yuv, 0, -1))


# ---------------------------------------------------------------- ffmpeg
def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


class FfmpegSource:
    """Decode any container via ffmpeg -> rawvideo rgb24 pipe (gated)."""

    def __init__(self, path: str, size_hw: Tuple[int, int]):
        if not have_ffmpeg():
            raise RuntimeError(
                "ffmpeg binary not available; use ImageDirSource/Y4mSource")
        self.size_hw = size_hw
        self.proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-"],
            stdout=subprocess.PIPE)

    def __iter__(self) -> Iterator[np.ndarray]:
        for u8 in self.iter_uint8():
            yield uint8_to_unit(u8)

    def iter_uint8(self) -> Iterator[np.ndarray]:
        h, w = self.size_hw
        nbytes = h * w * 3
        while True:
            raw = self.proc.stdout.read(nbytes)
            if len(raw) < nbytes:
                self.proc.wait()
                return
            yield np.frombuffer(raw, np.uint8).reshape(h, w, 3)


class FfmpegSink:
    """Encode frames via ffmpeg rawvideo stdin pipe (gated)."""

    def __init__(self, path: str, size_hw: Tuple[int, int], fps: int = 25,
                 codec: str = "libx264", crf: int = 18):
        if not have_ffmpeg():
            raise RuntimeError(
                "ffmpeg binary not available; use ImageDirSink/Y4mSink")
        h, w = size_hw
        self.proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-y", "-f", "rawvideo", "-pix_fmt",
             "rgb24", "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
             "-c:v", codec, "-crf", str(crf), path],
            stdin=subprocess.PIPE)

    def write(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame)
        u8 = frame if frame.dtype == np.uint8 else unit_to_uint8(frame)
        self.write_uint8(u8)

    def write_uint8(self, u8: np.ndarray) -> None:
        self.proc.stdin.write(u8.tobytes())

    def close(self):
        self.proc.stdin.close()
        self.proc.wait()


def open_source(path: str, size_hw: Optional[Tuple[int, int]] = None,
                ext: str = ".jpg"):
    """Dispatch: directory -> ImageDirSource, .y4m -> Y4mSource, other
    containers -> FfmpegSource (requires ffmpeg + size)."""
    if os.path.isdir(path):
        return ImageDirSource(path, ext)
    if path.endswith(".y4m"):
        return Y4mSource(path)
    if size_hw is None:
        raise ValueError("size_hw required for ffmpeg containers")
    return FfmpegSource(path, size_hw)


def iter_frames_uint8(source) -> Iterator[np.ndarray]:
    """Iterate uint8 HWC frames from any source; native ``iter_uint8``
    when available, else converted from the float protocol."""
    if hasattr(source, "iter_uint8"):
        return source.iter_uint8()
    return (f if np.asarray(f).dtype == np.uint8
            else unit_to_uint8(np.asarray(f)) for f in source)


def write_frame_uint8(sink, u8: np.ndarray) -> None:
    """Write a uint8 frame to any sink; native ``write_uint8`` when
    available, else via the float protocol."""
    if hasattr(sink, "write_uint8"):
        sink.write_uint8(u8)
    else:
        sink.write(uint8_to_unit(u8))


def open_sink(path: str, size_hw: Tuple[int, int], fps: int = 25,
              ext: str = ".jpg"):
    if path.endswith(".y4m"):
        return Y4mSink(path, size_hw, fps)
    if os.path.isdir(path) or not os.path.splitext(path)[1]:
        return ImageDirSink(path, ext=ext)
    return FfmpegSink(path, size_hw, fps)
