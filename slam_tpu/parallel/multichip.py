"""Multi-chip map-update step: the full per-frame compute path, sharded.

One jitted "update step" covering every dense stage of the SLAM pipeline for
a BATCH of frames (offline multi-sequence mapping / batched serving):

  pyramid -> corner response -> top-K keypoints -> IC-angle + rotated BRIEF
  -> cross-frame Hamming matching (MXU GEMM) -> many-hypothesis Sim3 RANSAC
  -> one bundle-adjustment LM solve

Frames ride the ``data`` mesh axis; RANSAC hypothesis banks ride ``hyp``.
Shardings are declared with ``NamedSharding``/``PartitionSpec`` and GSPMD
partitions the whole step — no hand-written collectives are needed because
the batch axes are embarrassingly parallel (SURVEY.md §2: the reference has
no distributed state to synchronize; the map stays on host).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_tpu.ops import ba, detector, orb
from slam_tpu.ops.hamming import unpack_bits_pm1
from slam_tpu.ops.pyramid import _pyramid_operators
from slam_tpu.ops.ransac import compute_sim3


def _batched_pyramid(images, width, height, scale_factors):
    """(B, H, W) -> list of (B, h, w) levels via the band-matrix chain."""
    sizes, resize_ops, blur_ops = _pyramid_operators(width, height, scale_factors)
    levels = [images]
    for rows, cols in resize_ops:
        prev = levels[-1]
        levels.append(jnp.rint(jnp.clip(
            jnp.einsum("ij,bjk,lk->bil", rows, prev, cols), 0.0, 255.0)))
    blurred = [jnp.rint(jnp.clip(
        jnp.einsum("ij,bjk,lk->bil", gr, lvl, gc), 0.0, 255.0))
        for (gr, gc), lvl in zip(blur_ops, levels)]
    return levels, blurred


def _frame_features(img, blur, budget, min_dist):
    resp = detector.shi_tomasi_response(img)
    xy, score, valid = detector.select_keypoints(resp, budget, min_dist)
    ang, desc = orb.compute_orb(img, blur, xy)
    return xy, ang, desc, valid


def _pair_match_and_sim3(desc_a, desc_b, pts_a, pts_b, valid_a, valid_b, keys):
    """Dense match + vmapped Sim3 hypotheses for one frame pair."""
    a = unpack_bits_pm1(desc_a)
    b = unpack_bits_pm1(desc_b)
    dist = (256 - jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)) // 2
    big = jnp.int32(10_000)
    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist, big)
    nn = jnp.argmin(dist, axis=1)
    nn_dist = jnp.min(dist, axis=1)
    good = valid_a & (nn_dist <= 50)
    matched = pts_b[nn]  # (N, 3)

    n = pts_a.shape[0]

    def hypo(key):
        p = good.astype(jnp.float32)
        idx = jax.random.choice(key, n, (3,), replace=False,
                                p=p / jnp.maximum(jnp.sum(p), 1.0))
        R, t, s = compute_sim3(pts_a[idx].T, matched[idx].T)
        resid = matched - (s * (pts_a @ R.T) + t)
        err = jnp.sum(resid * resid, axis=1)
        inl = jnp.sum((err < 0.01) & good)
        return R, t, s, inl

    Rs, ts, ss, inls = jax.vmap(hypo)(keys)
    best = jnp.argmax(inls)
    return Rs[best], ts[best], ss[best], inls[best]


class MultichipStep(NamedTuple):
    keypoints: jnp.ndarray
    descriptors: jnp.ndarray
    sim3_inliers: jnp.ndarray
    ba_cost: jnp.ndarray


def build_update_step(mesh: Mesh, width: int, height: int,
                      scale_factors: Tuple[float, ...] = (1.0, 1.2),
                      budget: int = 32, hypotheses: int = 16):
    """Compile the full sharded update step for a given geometry.

    Returns ``step(images, keys, ba_problem)`` where images is (B, H, W)
    sharded over ``data`` and keys is (B, hypotheses, 2) sharded over
    (``data``, ``hyp``).
    """
    data_sh = NamedSharding(mesh, P("data"))
    key_sh = NamedSharding(mesh, P("data", "hyp"))

    def step(images, keys, problem: ba.BAProblem):
        levels, blurred = _batched_pyramid(images.astype(jnp.float32),
                                           width, height, scale_factors)
        xy, ang, desc, valid = jax.vmap(
            lambda i, b: _frame_features(i, b, budget, 3))(levels[0], blurred[0])
        # synthetic 3D points from pixel rays at unit depth (the geometry the
        # real pipeline supplies from the map; shapes are what matter here)
        pts = jnp.concatenate([
            (xy - jnp.asarray([width / 2.0, height / 2.0])) / 100.0,
            jnp.ones_like(xy[..., :1])], axis=-1)
        # match frame b against frame (b+1) mod B
        desc_next = jnp.roll(desc, -1, axis=0)
        pts_next = jnp.roll(pts, -1, axis=0)
        valid_next = jnp.roll(valid, -1, axis=0)
        R, t, s, inl = jax.vmap(_pair_match_and_sim3)(
            desc, desc_next, pts, pts_next, valid, valid_next, keys)
        res = ba.solve_ba(problem, iterations=2, cg_iters=8)
        return MultichipStep(keypoints=xy, descriptors=desc,
                             sim3_inliers=inl, ba_cost=res.cost)

    jitted = jax.jit(step, in_shardings=(data_sh, key_sh, None),
                     out_shardings=None)
    return jitted


def tiny_ba_problem(n_kf: int = 4, n_mp: int = 16) -> ba.BAProblem:
    """A minimal, well-posed BA problem for dry runs."""
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    for i in range(n_kf):
        poses[i, 0, 3] = 0.1 * i
    points = rng.uniform([-1, -1, 3], [1, 1, 6], (n_mp, 3)).astype(np.float32)
    obs_kf, obs_mp, meas = [], [], []
    for k in range(n_kf):
        pc = points @ poses[k, :3, :3].T + poses[k, :3, 3]
        m = pc[:, :2] / pc[:, 2:3]
        for j in range(n_mp):
            obs_kf.append(k)
            obs_mp.append(j)
            meas.append(m[j])
    O = len(obs_kf)
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        pose_fixed=jnp.asarray([i == 0 for i in range(n_kf)]),
        points=jnp.asarray(points),
        points_fixed=jnp.zeros(n_mp, bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_mp=jnp.asarray(obs_mp, jnp.int32),
        obs_meas=jnp.asarray(np.array(meas), jnp.float32),
        obs_sqrt_info=jnp.full((O,), 100.0, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        pe_a=jnp.asarray(np.arange(1, n_kf), jnp.int32),
        pe_b=jnp.asarray(np.arange(0, n_kf - 1), jnp.int32),
        pe_meas=jnp.asarray(np.stack(
            [poses[b] @ np.linalg.inv(poses[a])
             for a, b in zip(range(1, n_kf), range(0, n_kf - 1))])),
        pe_sqrt_info=jnp.asarray(np.stack([np.eye(6, dtype=np.float32)] * (n_kf - 1))),
        pe_valid=jnp.ones(n_kf - 1, bool),
        pr_idx=jnp.zeros(1, jnp.int32),
        pr_meas=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        pr_sqrt_info=jnp.zeros((1, 6, 6), jnp.float32),
        pr_valid=jnp.zeros(1, bool),
    )
