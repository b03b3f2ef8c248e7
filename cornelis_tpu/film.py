"""Film: accumulation buffers, tonemap-to-sRGB, image IO, checkpointing.

The reference's FrameBuffer is a plain row-major pixel array with
sRGB-quantize-save at the end (include/cornelis/FrameBuffer.hpp,
src/Render.cpp:257-265). Here the film is an accumulating (sum, count) pair:
each dispatched sample chunk adds into it, which gives progressive rendering,
cooperative abort with a usable partial image, and checkpoint/resume for free
(the design the reference's Progress comment anticipates, Render.cpp:277-280).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import native as _native
from .math import color as _color
from .utils.png import write_png


class Film:
    """Accumulating framebuffer: linear radiance sums + sample count."""

    def __init__(self, width: int, height: int):
        if width <= 0 or height <= 0:
            raise ValueError("Film dimensions must be positive.")
        self.width = width
        self.height = height
        self.radiance_sum = np.zeros((height, width, 3), np.float32)
        self.sample_count = 0

    @property
    def aspect(self) -> float:
        """width / height (FrameBuffer.hpp:83-86)."""
        return self.width / self.height

    def add_samples(self, chunk_sum: np.ndarray, num_samples: int) -> None:
        """Accumulate a chunk's per-pixel radiance sums over num_samples spp."""
        chunk = np.asarray(chunk_sum, np.float32)
        if not _native.accumulate(self.radiance_sum, chunk):
            self.radiance_sum += chunk
        self.sample_count += num_samples

    def image(self) -> np.ndarray:
        """Current linear-RGB estimate: sum / count (the reference's
        1/samplesAA box-filter average, Render.cpp:245-251)."""
        if self.sample_count == 0:
            return np.zeros_like(self.radiance_sum)
        return self.radiance_sum / self.sample_count

    def to_srgb8(self, standard_srgb: bool = False) -> np.ndarray:
        """Linear -> sRGB -> 8-bit (saveImage pipeline, Render.cpp:257-265).

        Uses the native C++ tonemap when built (native/cornelis_native.cpp,
        the stb_image_write-era runtime rebuilt); falls back to jnp.
        """
        img = self.image()
        out = _native.srgb_quantize(img, standard=standard_srgb)
        if out is not None:
            return out
        encoded = np.asarray(_color.srgb_encode(img, standard=standard_srgb))
        return np.asarray(_color.quantize_to_8bit(encoded))

    def save_png(self, path: str, standard_srgb: bool = False) -> None:
        srgb8 = self.to_srgb8(standard_srgb=standard_srgb)
        if not _native.write_png(path, srgb8):
            write_png(path, srgb8)

    # -- checkpoint / resume ------------------------------------------------
    def save_checkpoint(self, path: str, next_sample: int = 0, seed: int = 0) -> None:
        """Persist the accumulation state; progressive renders resume from it."""
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                radiance_sum=self.radiance_sum,
                sample_count=np.int64(self.sample_count),
                next_sample=np.int64(next_sample),
                seed=np.int64(seed),
            )
        os.replace(tmp, path)

    @staticmethod
    def load_checkpoint(path: str) -> tuple["Film", int, int]:
        """Returns (film, next_sample, seed)."""
        data = np.load(path)
        s = data["radiance_sum"]
        film = Film(s.shape[1], s.shape[0])
        film.radiance_sum = s.astype(np.float32)
        film.sample_count = int(data["sample_count"])
        return film, int(data["next_sample"]), int(data["seed"])


def mse(a: np.ndarray, b: np.ndarray) -> float:
    """Mean squared error between two images (golden-test helper)."""
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def load_image_linear(path: str, standard_srgb: bool = False) -> Optional[np.ndarray]:
    """Load a PNG back into linear RGB floats (inverse of save_png)."""
    from .utils.png import read_png

    srgb8 = read_png(path).astype(np.float32) / 255.0
    return np.asarray(_color.srgb_decode(srgb8, standard=standard_srgb))
