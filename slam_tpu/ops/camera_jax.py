"""Camera *projection* in JAX for use inside jitted kernels.

Only the forward (ray -> pixel) direction is needed on device (RANSAC inlier
counting, batched reprojection checks); the iterative undistortion stays on
host (`geometry/camera.py`). Parameters are packed into a flat float32 vector
so one compiled kernel serves any camera of a given kind.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from slam_tpu.geometry.camera import Camera, KannalaBrandtCamera, PinholeCamera


def pack_camera(cam: Camera) -> Tuple[str, np.ndarray]:
    """Camera -> (static kind, packed float32 params)."""
    if isinstance(cam, PinholeCamera):
        return "pinhole", np.array(
            [cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
             cam.k1, cam.k2, cam.p1, cam.p2], np.float32)
    if isinstance(cam, KannalaBrandtCamera):
        return "kannala_brandt", np.array(
            [cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
             cam.k1, cam.k2, cam.k3, cam.k4], np.float32)
    raise TypeError(type(cam))


def project(kind: str, params, pts):
    """(..., 3) camera-frame points -> ((..., 2) pixels, (...,) valid).

    Validity = in front of the camera and inside the image bounds, matching
    the host `reproject_to_image` semantics (keyframe.cpp:340-356).
    """
    fx, fy, cx, cy, w, h = (params[i] for i in range(6))
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    if kind == "pinhole":
        k1, k2, p1, p2 = (params[i] for i in range(6, 10))
        front = z > 1e-9
        zs = jnp.where(front, z, 1.0)
        xn = x / zs
        yn = y / zs
        r2 = xn * xn + yn * yn
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
        yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
        u = fx * xd + cx
        v = fy * yd + cy
        valid = front
    elif kind == "kannala_brandt":
        k1, k2, k3, k4 = (params[i] for i in range(6, 10))
        r = jnp.hypot(x, y)
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = jnp.where(r > 1e-12, theta_d / jnp.maximum(r, 1e-12), 1.0)
        u = fx * x * scale + cx
        v = fy * y * scale + cy
        valid = theta < jnp.radians(100.0)
    else:
        raise ValueError(kind)
    valid = valid & (u >= 0) & (v >= 0) & (u < w) & (v < h)
    return jnp.stack([u, v], axis=-1), valid


def unproject(kind: str, params, pix):
    """(..., 2) pixels -> (..., 3) unit bearing vectors, on device.

    Inverse of :func:`project` for use inside fully-jitted steps (the host
    pipeline uses the iterative `geometry/camera.py` undistortion). Pinhole
    distortion is inverted with a few fixed-point iterations (exact for
    k1=k2=p1=p2=0); Kannala-Brandt inverts theta_d -> theta by Newton steps.
    """
    fx, fy, cx, cy = (params[i] for i in range(4))
    u, v = pix[..., 0], pix[..., 1]
    xn = (u - cx) / fx
    yn = (v - cy) / fy
    if kind == "pinhole":
        k1, k2, p1, p2 = (params[i] for i in range(6, 10))
        x, y = xn, yn
        for _ in range(5):  # fixed-point undistortion
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            x = (xn - dx) / radial
            y = (yn - dy) / radial
        b = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    elif kind == "kannala_brandt":
        k1, k2, k3, k4 = (params[i] for i in range(6, 10))
        theta_d = jnp.hypot(xn, yn)
        theta = theta_d
        for _ in range(5):  # Newton: f(t) = t(1 + k1 t^2 + ...) - theta_d
            t2 = theta * theta
            f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
            df = (1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2
                  + t2 * (7.0 * k3 + t2 * 9.0 * k4))))
            theta = theta - f / jnp.maximum(df, 1e-6)
        scale = jnp.where(theta_d > 1e-12,
                          jnp.sin(theta) / jnp.maximum(theta_d, 1e-12), 1.0)
        b = jnp.stack([xn * scale, yn * scale,
                       jnp.cos(theta) * jnp.ones_like(xn)], axis=-1)
    else:
        raise ValueError(kind)
    return b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
