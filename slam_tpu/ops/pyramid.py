"""Image pyramid as MXU matmul chains.

TPU-native rebuild of the reference pyramid (reference: image_pyramid.cpp —
CpuImagePyramid::update:68-86 does a bilinear-resize chain plus a 7x7
sigma=2 Gaussian blur per level with BORDER_REFLECT_101; the GPU variant
98-206 uses separable convolution shaders).

Design: both bilinear resize and separable Gaussian blur are *linear* row/col
operators, so each level is computed as ``Rows @ img @ Cols^T`` — two dense
matmuls per step that map straight onto the MXU with no gather/scatter and no
conv lowering. The band matrices are built once per image geometry (static
shapes) and folded together so one level costs:

    level_l   = R_l @ level_{l-1} @ C_l^T          (bilinear resize)
    blurred_l = G_rows_l @ level_l @ G_cols_l^T    (Gaussian, reflect-101)

The whole pyramid for a frame is one jit-compiled call; levels are returned
as a list of (H_l, W_l) float32 arrays (values in [0, 255], same scale as the
reference's uint8 images).
"""
from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.params import StaticSettings


def level_sizes(width: int, height: int, scale_factors: Sequence[float]) -> List[Tuple[int, int]]:
    """Per-level (width, height), replicating the reference's rounding
    (image_pyramid.cpp:77-78: size = round(full_size / cumulative_scale))."""
    out = []
    for s in scale_factors:
        out.append((int(round(width / float(s))), int(round(height / float(s)))))
    return out


def _bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation operator with half-pixel centers.

    Matches OpenCV INTER_LINEAR's float path: src = (dst + 0.5) * scale - 0.5
    with edge clamping.
    """
    A = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        i0c = min(max(i0, 0), n_in - 1)
        i1c = min(max(i0 + 1, 0), n_in - 1)
        A[i, i0c] += 1.0 - frac
        A[i, i1c] += frac
    return A


def gaussian_kernel_1d(width: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Normalized 1-D Gaussian taps (reference: image_pyramid.cpp:103-114)."""
    x = np.arange(width, dtype=np.float64) - (width - 1) * 0.5
    k = np.exp(-0.5 * x * x / (sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    """(n, n) banded operator applying 1-D taps with BORDER_REFLECT_101.

    Reflect-101 maps out-of-range index -k to +k and n-1+k to n-1-k
    (the border mode the reference uses, image_pyramid.cpp:84, 166).
    """
    half = len(taps) // 2
    A = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        for t, w in enumerate(taps):
            j = i + t - half
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            j = min(max(j, 0), n - 1)
            A[i, j] += w
    return A


@functools.lru_cache(maxsize=8)
def _pyramid_operators(width: int, height: int, scale_key: tuple):
    """Precompute all band matrices for a given image geometry.

    Returns plain NumPy arrays (NOT jax arrays): this function is reachable
    from inside jit traces, and caching trace-created values would leak
    tracers. NumPy constants fold into the jaxpr at each trace.
    """
    sizes = level_sizes(width, height, scale_key)
    taps = gaussian_kernel_1d()
    resize_ops = []   # (rows, cols) per level >= 1
    blur_ops = []     # (rows, cols) per level
    for lvl, (w, h) in enumerate(sizes):
        if lvl > 0:
            pw, ph = sizes[lvl - 1]
            resize_ops.append((_bilinear_matrix(h, ph), _bilinear_matrix(w, pw)))
        blur_ops.append((_blur_matrix(h, taps), _blur_matrix(w, taps)))
    return sizes, resize_ops, blur_ops


def _build_pyramid_impl(image, resize_ops, blur_ops):
    # Each level is quantized back to the uint8 grid like the reference, which
    # stores uint8 cv::Mat levels (image_pyramid.cpp:75-85); the next level is
    # resized from the quantized previous level.
    levels = [image]
    for rows, cols in resize_ops:
        prev = levels[-1]
        levels.append(jnp.rint(jnp.clip(rows @ prev @ cols.T, 0.0, 255.0)))
    blurred = [jnp.rint(jnp.clip(g_rows @ lvl @ g_cols.T, 0.0, 255.0))
               for (g_rows, g_cols), lvl in zip(blur_ops, levels)]
    return levels, blurred


class ImagePyramid:
    """Jit-compiled pyramid builder for a fixed image geometry.

    Equivalent of the reference's ``ImagePyramid`` interface
    (image_pyramid.hpp:16-30): ``update()`` recomputes levels for a new frame;
    ``levels``/``blurred`` expose the plain and blurred images per level.
    """

    def __init__(self, settings: StaticSettings, width: int, height: int):
        self.scale_factors = tuple(float(s) for s in settings.scaleFactors)
        self.width = width
        self.height = height
        self.sizes, self._resize_ops, self._blur_ops = _pyramid_operators(
            width, height, self.scale_factors)
        self._fn = jax.jit(
            lambda img: _build_pyramid_impl(img, self._resize_ops, self._blur_ops))
        self.levels: List[jnp.ndarray] = []
        self.blurred: List[jnp.ndarray] = []

    def update(self, image) -> "ImagePyramid":
        img = jnp.asarray(image, dtype=jnp.float32)
        assert img.shape == (self.height, self.width), (img.shape, self.height, self.width)
        self.levels, self.blurred = self._fn(img)
        return self

    @property
    def num_levels(self) -> int:
        return len(self.sizes)


def build_pyramid(settings: StaticSettings, image) -> ImagePyramid:
    """One-shot helper: build and fill a pyramid for an image."""
    h, w = np.asarray(image).shape
    return ImagePyramid(settings, w, h).update(image)
