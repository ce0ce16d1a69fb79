"""Batched SE(3) Lie-group ops for jitted kernels (float32-friendly).

Tangent convention matches g2o::SE3Quat (and the host `geometry/se3.py`):
[omega, upsilon] — rotation first. Updates are LEFT-multiplicative
(T_new = exp(delta) @ T), matching g2o's VertexSE3Expmap::oplusImpl.
All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(v):
    """(..., 3) -> (..., 3, 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def so3_exp(omega):
    """(..., 3) -> (..., 3, 3) via Rodrigues with small-angle switch."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    # series: sin(t)/t ~ 1 - t^2/6; (1-cos t)/t^2 ~ 1/2 - t^2/24
    a = jnp.where(small, 1.0 - theta2 / 6.0,
                  jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    K = skew(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R):
    """(..., 3, 3) -> (..., 3); safe for angles < pi - eps.

    Differentiation-safe at the identity: the small-angle branch is a series
    in |w|^2 (|w| = 2 sin theta), and the arccos input is pushed away from
    +/-1 on small lanes (double-where), so jacfwd/jacrev stay finite — BA
    pose edges and priors start at exactly zero error in the device-VO pose
    step and at the odometry-seeded newest keyframe."""
    cos_t = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) / 2.0,
                     -1.0, 1.0)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    small = cos_t > 1.0 - 1e-7          # theta < ~4.5e-4
    cos_safe = jnp.where(small, 0.0, cos_t)
    theta = jnp.arccos(cos_safe)
    sin_t = jnp.sin(theta)
    w2 = jnp.sum(w * w, axis=-1)        # = 4 sin^2(theta)
    scale = jnp.where(small, 0.5 + w2 / 48.0,
                      theta / jnp.where(small, 1.0, 2.0 * sin_t))
    return w * scale[..., None]


def se3_exp(xi):
    """(..., 6) [omega, upsilon] -> (..., 4, 4)."""
    omega = xi[..., :3]
    upsilon = xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    R = so3_exp(omega)
    K = skew(omega)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T):
    """(..., 4, 4) -> (..., 6) [omega, upsilon]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    K = skew(omega)
    half = theta / 2.0
    # (1 - half*cot(half)) / theta^2, series: 1/12 + t^2/720
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)))
        / jnp.where(small, 1.0, theta2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * K + cot_term[..., None, None] * (K @ K)
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([omega, upsilon], axis=-1)


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)
