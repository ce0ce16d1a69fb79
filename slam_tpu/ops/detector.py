"""Corner detection on TPU: Shi-Tomasi (GFTT) and FAST responses + top-K.

Rebuild of the per-level feature detection the reference delegates to the
host tracker's detector (reference: feature_detector.cpp:68-134 — per-level
GFTT/FAST with per-level keypoint budgets, scaled min-distance, and
ORB_PATCH_RADIUS=19 border margins).

TPU-first design: instead of the reference's sequential greedy
min-distance selection, we compute a dense response map, suppress non-maxima
with a max-pool whose window implements the min-distance constraint, and take
the per-level budget with one ``lax.top_k`` over the flattened response.
Everything is static-shaped: each level returns exactly ``budget`` slots with
a validity mask.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.params import ORB_PATCH_RADIUS


def shi_tomasi_response(img: jnp.ndarray) -> jnp.ndarray:
    """Min-eigenvalue corner response (GFTT), 3x3 Sobel + 3x3 window.

    Same quantity OpenCV's ``cornerMinEigenVal`` ranks corners by for
    ``goodFeaturesToTrack``: lambda_min of the local structure tensor.
    """
    img = img.astype(jnp.float32)
    # 3x3 Sobel via separable [1,2,1] smoothing and [-1,0,1] difference
    def sep(img, kr, kc):
        padded = jnp.pad(img, 1, mode="edge")
        rows = (kr[0] * padded[:-2, :] + kr[1] * padded[1:-1, :] + kr[2] * padded[2:, :])
        return (kc[0] * rows[:, :-2] + kc[1] * rows[:, 1:-1] + kc[2] * rows[:, 2:])

    gx = sep(img, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    gy = sep(img, (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))

    def box3(a):
        p = jnp.pad(a, 1, mode="edge")
        return (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])

    gxx = box3(gx * gx)
    gyy = box3(gy * gy)
    gxy = box3(gx * gy)
    tr = gxx + gyy
    det_part = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4.0 * gxy * gxy, 0.0))
    return 0.5 * (tr - det_part)


# FAST-9/16 Bresenham circle offsets (row, col), radius 3
_FAST_OFFSETS = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)


def fast_response(img: jnp.ndarray, threshold: float = 10.0) -> jnp.ndarray:
    """FAST-9/16 corner response.

    A pixel is a corner when >= 9 *contiguous* circle pixels are all brighter
    than center+t or all darker than center-t; the response is the summed
    absolute difference over the qualifying circle pixels (the standard FAST
    score used for NMS).
    """
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 3, mode="edge")
    h, w = img.shape
    circle = jnp.stack([p[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
                        for dy, dx in _FAST_OFFSETS])  # (16, H, W)
    center = img[None]
    bright = circle > center + threshold
    dark = circle < center - threshold

    def has_run9(mask):
        # contiguous run of >= 9 on a 16-cycle: AND of 9 rotations
        acc = mask
        for k in range(1, 9):
            acc = acc & jnp.roll(mask, -k, axis=0)
        return jnp.any(acc, axis=0)

    is_corner = has_run9(bright) | has_run9(dark)
    diff = jnp.abs(circle - center) - threshold
    score_b = jnp.sum(jnp.where(bright, diff, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(dark, diff, 0.0), axis=0)
    return jnp.where(is_corner, jnp.maximum(score_b, score_d), 0.0)


def _maxpool2d(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Same-size max pool (window x window, stride 1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding="SAME")


def select_keypoints(response: jnp.ndarray, budget: int, min_distance: int,
                     margin: int = ORB_PATCH_RADIUS
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + top-K selection with static output shape.

    Returns (xy (budget, 2) float32, score (budget,), valid (budget,) bool).
    ``min_distance`` is enforced by requiring each selected pixel to be the
    maximum of its (2*min_distance+1)^2 neighborhood (grid NMS) — the
    TPU-friendly replacement for the reference detector's greedy suppression
    (feature_detector.cpp:77-98).
    """
    h, w = response.shape
    window = 2 * max(int(min_distance), 1) + 1
    pooled = _maxpool2d(response, window)
    is_peak = (response >= pooled) & (response > 0.0)

    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_margin = ((row >= margin) & (row < h - margin)
                 & (col >= margin) & (col < w - margin))
    masked = jnp.where(is_peak & in_margin, response, -jnp.inf)

    flat = masked.reshape(-1)
    scores, idx = jax.lax.top_k(flat, budget)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = jnp.isfinite(scores) & (scores > 0.0)
    xy = jnp.stack([xs, ys], axis=-1)
    return xy, jnp.where(valid, scores, 0.0), valid
