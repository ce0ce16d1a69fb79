"""Batched ORB orientation + rotated-BRIEF descriptors on TPU.

Rebuild of the reference extractor's per-keypoint math (reference:
orb_extractor.cpp — ``ic_angle``:245-275, ``compute_orb_descriptor``:284-352,
the circular ``u_max`` bounds built at 174-186) with identical numerics:

  - orientation = intensity-centroid angle in DEGREES via OpenCV's
    ``cv::fastAtan2`` polynomial (replicated here bit-for-bit in float32),
  - descriptor sampling uses the reference's fast cos/sin approximation
    (reference: openvslam/trigonometric.h:17-47) and round-half-even
    (``cvRound``) offset rounding,
  - the 256-bit output packs LSB-first into eight uint32 words, the same
    layout as the reference's ``KeyPoint::Descriptor`` (key_point.hpp:19-20).

TPU-first shape: one (N, 39, 39) patch gather per level feeds both the
orientation moments (a pair of masked weighted sums — VPU) and the descriptor
sampling (per-keypoint ``take_along_axis`` into the flattened patch). No
per-keypoint loops; N is the static per-level budget.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops.orb_pattern import ORB_PATTERN

HALF_PATCH = 15          # fast_half_patch_size_ (orb_extractor.cpp:206)
PATCH_RADIUS = 19        # ORB_PATCH_RADIUS: descriptor sampling never leaves this
PATCH_SIZE = 2 * PATCH_RADIUS + 1


@functools.lru_cache(maxsize=1)
def u_max_table() -> np.ndarray:
    """Circular patch bounds (reference: orb_extractor.cpp:174-186)."""
    u_max = np.zeros(HALF_PATCH + 1, dtype=np.int64)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        u_max[v] = int(round(np.sqrt(HALF_PATCH * HALF_PATCH - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while u_max[v0] == u_max[v0 + 1]:
            v0 += 1
        u_max[v] = v0
        v0 += 1
    return u_max


@functools.lru_cache(maxsize=1)
def _moment_weights() -> Tuple[np.ndarray, np.ndarray]:
    """(31,31) weight masks turning the reference's ic_angle loops into two
    dense weighted sums: W10[dv,du]=du, W01[dv,du]=dv inside the circle."""
    um = u_max_table()
    n = 2 * HALF_PATCH + 1
    w10 = np.zeros((n, n), dtype=np.float32)
    w01 = np.zeros((n, n), dtype=np.float32)
    for dv in range(-HALF_PATCH, HALF_PATCH + 1):
        d = um[abs(dv)] if dv != 0 else HALF_PATCH
        for du in range(-d, d + 1):
            w10[dv + HALF_PATCH, du + HALF_PATCH] = du
            w01[dv + HALF_PATCH, du + HALF_PATCH] = dv
    return w10, w01


# OpenCV cv::fastAtan2 polynomial constants (modules/core/src/mathfuncs.cpp)
_RAD2DEG = 180.0 / np.pi
_ATAN2_P1 = np.float32(0.9997878412794807 * _RAD2DEG)
_ATAN2_P3 = np.float32(-0.3258083974640975 * _RAD2DEG)
_ATAN2_P5 = np.float32(0.1555786518463281 * _RAD2DEG)
_ATAN2_P7 = np.float32(-0.04432655554792128 * _RAD2DEG)
_DBL_EPS = np.float32(2.220446049250313e-16)


def fast_atan2_deg(y, x):
    """cv::fastAtan2 — angle in degrees [0, 360), float32 polynomial.

    The reference's ic_angle returns this directly (orb_extractor.cpp:273-274,
    'unlike std::atan2, this returns the angle in DEGREES!!').
    """
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    ax, ay = jnp.abs(x), jnp.abs(y)
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    c = lo / (hi + _DBL_EPS)
    c2 = c * c
    a = ((_ATAN2_P7 * c2 + _ATAN2_P5) * c2 + _ATAN2_P3) * c2 * c + _ATAN2_P1 * c
    a = jnp.where(ax >= ay, a, np.float32(90.0) - a)
    a = jnp.where(x < 0, np.float32(180.0) - a, a)
    a = jnp.where(y < 0, np.float32(360.0) - a, a)
    return a


# Reference fast trig (openvslam/trigonometric.h:11-47), float32 throughout.
_PI = np.float32(3.14159265358979)
_PI_2 = np.float32(_PI / 2.0)
_TWO_PI = np.float32(2.0 * _PI)
_INV_TWO_PI = np.float32(1.0 / _TWO_PI)
_THREE_PI_2 = np.float32(3.0 * _PI_2)


def _cos_core(v):
    c1 = np.float32(0.99940307)
    c2 = np.float32(-0.49558072)
    c3 = np.float32(0.03679168)
    v2 = v * v
    return c1 + v2 * (c2 + c3 * v2)


def fast_cos(v):
    v = jnp.asarray(v, jnp.float32)
    v = v - jnp.floor(v * _INV_TWO_PI) * _TWO_PI
    v = jnp.abs(v)
    return jnp.where(
        v < _PI_2, _cos_core(v),
        jnp.where(v < _PI, -_cos_core(_PI - v),
                  jnp.where(v < _THREE_PI_2, -_cos_core(v - _PI),
                            _cos_core(_TWO_PI - v))))


def fast_sin(v):
    return fast_cos(_PI_2 - jnp.asarray(v, jnp.float32))


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray,
                    radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Gather (N, 2r+1, 2r+1) patches centered at integer keypoints.

    Out-of-bounds indices are clamped; callers must mask keypoints closer than
    ``radius`` to the border (the margins guarantee this for valid slots).

    TPU formulation: two one-hot matmuls on the MXU (row selection as an
    (N*S, H) @ (H, W) GEMM, then per-keypoint column selection as a batched
    (N, S, W) @ (N, W, S) GEMM) instead of an advanced-index gather — measured
    ~10x faster at level-0 geometry (gathers serialize on the VPU/scalar unit;
    one-hot matmuls are exact since each output row has exactly one nonzero).
    """
    h, w = img.shape
    n = xy.shape[0]
    s = 2 * radius + 1
    f = img.astype(jnp.float32)
    x = jnp.clip(xy[:, 0].astype(jnp.int32), radius, w - 1 - radius)
    y = jnp.clip(xy[:, 1].astype(jnp.int32), radius, h - 1 - radius)
    d = jnp.arange(-radius, radius + 1)
    ry = (y[:, None] + d[None, :]).reshape(-1)                      # (N*S,)
    oh_rows = (ry[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
    rows = (oh_rows @ f).reshape(n, s, w)                           # (N, S, W)
    cx = x[:, None] + d[None, :]                                    # (N, S)
    oh_cols = (cx[:, None, :] == jnp.arange(w)[None, :, None]).astype(jnp.float32)
    return jnp.einsum("nsw,nwt->nst", rows, oh_cols).astype(img.dtype)


def ic_angles(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (degrees) from (N, >=31, >=31) patches."""
    c = (patches.shape[-1] - (2 * HALF_PATCH + 1)) // 2
    p31 = patches[:, c:c + 2 * HALF_PATCH + 1, c:c + 2 * HALF_PATCH + 1]
    w10, w01 = _moment_weights()
    m10 = jnp.sum(p31 * jnp.asarray(w10), axis=(1, 2))
    m01 = jnp.sum(p31 * jnp.asarray(w01), axis=(1, 2))
    return fast_atan2_deg(m01, m10)


@functools.lru_cache(maxsize=1)
def _pattern_arrays():
    pat = ORB_PATTERN.astype(np.float32)
    return pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]


def descriptors_from_patches(blur_patches: jnp.ndarray,
                             angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF over (N, 39, 39) blurred-image patches -> (N, 8) uint32.

    Exactly mirrors the reference's scalar path (orb_extractor.cpp:326-348):
    offsets rotate the learned pairs with the fast cos/sin approximation and
    round-half-even; bit i set iff sample_a < sample_b.

    TPU formulation: the 512 per-keypoint patch samples are fetched with two
    exact one-hot contractions on the MXU (row select then column select over
    the (N, S, S) patch stack) instead of a ``take_along_axis`` gather —
    batched gathers serialize on the VPU and dominated the whole front-end
    (~4 ms/frame of the 5.4 ms step; the one-hot path removes that wall).
    One-hot selection is exact: each row of the selector has a single 1.
    """
    n = blur_patches.shape[0]
    size = blur_patches.shape[-1]
    radius = (size - 1) // 2
    angle = angles_deg.astype(jnp.float32) * np.float32(np.pi / 180.0)
    ca = fast_cos(angle)[:, None]   # (N, 1)
    sa = fast_sin(angle)[:, None]

    p0a, p1a, p0b, p1b = _pattern_arrays()

    # row = cvRound(p0*sin + p1*cos); col = cvRound(p0*cos - p1*sin)
    # a-samples and b-samples share one (N, 512) selection axis
    p0 = jnp.concatenate([jnp.broadcast_to(p0a, (n, 256)),
                          jnp.broadcast_to(p0b, (n, 256))], axis=1)
    p1 = jnp.concatenate([jnp.broadcast_to(p1a, (n, 256)),
                          jnp.broadcast_to(p1b, (n, 256))], axis=1)
    r = jnp.rint(p0 * sa + p1 * ca).astype(jnp.int32) + radius   # (N, 512)
    c = jnp.rint(p0 * ca - p1 * sa).astype(jnp.int32) + radius
    grid = jnp.arange(size)
    oh_r = (r[..., None] == grid).astype(jnp.float32)            # (N, 512, S)
    oh_c = (c[..., None] == grid).astype(jnp.float32)
    inter = jnp.einsum("nps,nst->npt", oh_r,
                       blur_patches.astype(jnp.float32))         # (N, 512, S)
    vals = jnp.einsum("npt,npt->np", inter, oh_c)                # (N, 512)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)    # (N, 256)
    weights = jnp.asarray(np.uint32(1) << np.arange(32, dtype=np.uint32))
    words = jnp.sum(bits.reshape(n, 8, 32) * weights, axis=-1, dtype=jnp.uint32)
    return words


def compute_orb(level_img: jnp.ndarray, blurred_img: jnp.ndarray,
                xy: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Angles (deg) and descriptors for integer keypoints on one level.

    The reference quantizes pixel values to uint8 before both ic_angle and the
    descriptor comparisons; we replicate by rounding the float pyramid to
    match (resize/blur outputs feed through the same quantization).
    """
    q_img = jnp.rint(jnp.clip(level_img, 0.0, 255.0))
    q_blur = jnp.rint(jnp.clip(blurred_img, 0.0, 255.0))
    patches = extract_patches(q_img, xy)
    angles = ic_angles(patches)
    blur_patches = extract_patches(q_blur, xy)
    desc = descriptors_from_patches(blur_patches, angles)
    return angles, desc
