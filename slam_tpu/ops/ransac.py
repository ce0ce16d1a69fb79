"""Many-hypothesis RANSAC on TPU: Sim3 / planar-rotation Horn and essential 8-point.

Rebuild of the reference's sequential RANSAC loops as vmapped batch solves:

  - ``compute_sim3`` / ``compute_rot_z``: closed-form Horn absolute
    orientation (reference: loop_ransac.cpp:112-196, 277-312) — all K
    hypotheses are solved at once (batched 4x4 eigendecomposition / scalar
    closed form) and all inliers counted with one batched reprojection, then
    argmax picks the winner (replaces the loop at loop_ransac.cpp:67-105);
  - essential 8-point (reference: openvslam/essential_solver.cc:11-118):
    nullspace via eigendecomposition of A^T A, rank-2 projection via batched
    3x3 SVD, symmetric epipolar-cosine scoring (essential_solver.cc:164-215).

Sampling uses ``jax.random`` with caller-provided seeds: deterministic by
construction, mirroring the reference's fixed-seed MT19937 reproducibility
guarantee (openvslam/random_array.cc:21).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import camera_jax

# ---------------------------------------------------------------------------
# Closed-form solvers (single-hypothesis, jnp; host-callable with numpy too)
# ---------------------------------------------------------------------------


def compute_sim3(pts_1, pts_2):
    """Horn closed-form absolute orientation with scale.

    pts_1, pts_2: (3, 3) matrices whose COLUMNS are corresponding points
    (matching the reference's layout, loop_ransac.cpp:112-196). Returns
    (rot_21, trans_21, scale_21) with p2 = s * R @ p1 + t.
    """
    pts_1 = jnp.asarray(pts_1)
    pts_2 = jnp.asarray(pts_2)
    c1 = jnp.mean(pts_1, axis=1)
    c2 = jnp.mean(pts_2, axis=1)
    a1 = pts_1 - c1[:, None]
    a2 = pts_2 - c2[:, None]
    M = a1 @ a2.T
    sxx, sxy, sxz = M[0, 0], M[0, 1], M[0, 2]
    syx, syy, syz = M[1, 0], M[1, 1], M[1, 2]
    szx, szy, szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    # N is symmetric: the unit quaternion maximizing the form is the
    # eigenvector of the largest eigenvalue (eigh returns ascending order).
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # (w, x, y, z)
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
    ])
    a1_in_2 = R @ a1
    denom = jnp.sum(a1 * a1)
    numer = jnp.sum(a2 * a1_in_2)
    s = numer / denom
    t = c2 - s * (R @ c1)
    return R, t, s


def compute_rot_z(pts_1, pts_2):
    """Planar (yaw-only) Horn variant (reference: loop_ransac.cpp:277-312)."""
    pts_1 = jnp.asarray(pts_1)
    pts_2 = jnp.asarray(pts_2)
    c1 = jnp.mean(pts_1, axis=1)
    c2 = jnp.mean(pts_2, axis=1)
    a1 = pts_1 - c1[:, None]
    a2 = pts_2 - c2[:, None]
    C = jnp.sum(a1[:2] * a2[:2])
    S = jnp.sum(a1[0] * a2[1] - a1[1] * a2[0])
    norm = jnp.sqrt(C * C + S * S)
    ct = C / norm
    st = S / norm
    R = jnp.array([[ct, -st, 0.0], [st, ct, 0.0], [0.0, 0.0, 1.0]])
    s = jnp.sum(a2 * (R @ a1)) / jnp.sum(a1 * a1)
    t = c2 - s * (R @ c1)
    return R, t, s


# ---------------------------------------------------------------------------
# Sim3 RANSAC (LoopRansac equivalent)
# ---------------------------------------------------------------------------


class Sim3RansacResult(NamedTuple):
    ok: bool
    rot_12: np.ndarray
    trans_12: np.ndarray
    scale_12: float
    inliers: np.ndarray          # (N,) bool over match list
    num_inliers: int


def _sim3_ransac_core(keys, pts1, pts2, valid, repro1, repro2, vis1, vis2,
                      chi1, chi2, params1, params2,
                      kind1, kind2, dof, fix_scale):
    """Hypothesis bank from explicit ``keys`` (K, 2): the shared core of the
    single-chip jitted entry below and the sharded multi-chip step (which
    shards the hypothesis axis over the ``hyp`` mesh axis)."""
    n = pts1.shape[0]

    def sample(k):
        # 3 distinct indices among the valid matches: sample by perturbed
        # uniform over valid slots (weights 0 for padding)
        p = valid.astype(jnp.float32)
        return jax.random.choice(k, n, shape=(3,), replace=False, p=p / jnp.sum(p))

    idx = jax.vmap(sample)(keys)                     # (K, 3)
    s1 = pts1[idx].transpose(0, 2, 1)                # (K, 3, 3) columns = points
    s2 = pts2[idx].transpose(0, 2, 1)

    solver = compute_rot_z if dof == "ZROT" else compute_sim3
    R21, t21, s21 = jax.vmap(solver)(s1, s2)         # (K,3,3), (K,3), (K,)
    if fix_scale:
        s21 = jnp.ones_like(s21)
    s12 = 1.0 / s21
    R12 = jnp.swapaxes(R21, 1, 2)
    t12 = -s12[:, None] * jnp.einsum("kij,kj->ki", R12, t21)

    # count inliers for every hypothesis: project pts1 into cam2 under
    # (s21 R21, t21) and pts2 into cam1 under (s12 R12, t12)
    # (reference: loop_ransac.cpp:198-254)
    p1_in_2 = (jnp.einsum("kij,nj->kni", R21 * s21[:, None, None], pts1)
               + t21[:, None, :])                   # (K, N, 3)
    p2_in_1 = (jnp.einsum("kij,nj->kni", R12 * s12[:, None, None], pts2)
               + t12[:, None, :])
    proj1_in_2, v12 = camera_jax.project(kind2, params2, p1_in_2)
    proj2_in_1, v21 = camera_jax.project(kind1, params1, p2_in_1)
    err2 = jnp.sum((proj1_in_2 - repro2[None]) ** 2, axis=-1)  # (K, N)
    err1 = jnp.sum((proj2_in_1 - repro1[None]) ** 2, axis=-1)
    ok = (valid[None] & vis1[None] & vis2[None] & v12 & v21
          & (err2 < chi2[None]) & (err1 < chi1[None]))
    counts = jnp.sum(ok, axis=1)                     # (K,)
    best = jnp.argmax(counts)
    return (counts[best], R12[best], t12[best], s12[best], ok[best])


@functools.partial(jax.jit, static_argnames=("kind1", "kind2", "dof", "fix_scale", "iterations"))
def _sim3_ransac_impl(seed, pts1, pts2, valid, repro1, repro2, vis1, vis2,
                      chi1, chi2, params1, params2,
                      kind1, kind2, dof, fix_scale, iterations):
    keys = jax.random.split(jax.random.PRNGKey(seed), iterations)
    # Horn solves + inlier reprojection are tiny-matrix geometry: pin to
    # full-f32 passes (the TPU default's bf16 passes corrupt pose-scale
    # results; see ops/ba._lm_run)
    with jax.default_matmul_precision("highest"):
        return _sim3_ransac_core(keys, pts1, pts2, valid, repro1, repro2,
                                 vis1, vis2, chi1, chi2, params1, params2,
                                 kind1, kind2, dof, fix_scale)


class Sim3Ransac:
    """Equivalent of the reference ``LoopRansac`` (loop_ransac.hpp:27-109).

    Construct with camera-frame 3D correspondences; ``solve`` evaluates all
    hypotheses in parallel on device.
    """

    CHI_SQ_2D = 9.21034  # p=0.01, loop_ransac.cpp:28

    def __init__(self, camera1, camera2, pts1_cam, pts2_cam,
                 sigma_sq1, sigma_sq2):
        self.n = len(pts1_cam)
        # Pad the match axis to a 64-bucket: the jitted core compiles per
        # static shape, and match counts vary per closure attempt — on the
        # tunnel every fresh shape is a ~30 s remote compile (CLAUDE.md
        # compile-leak rule). The core masks padding via ``valid`` (zero
        # sampling weight + excluded from inlier counts).
        n_pad = max(64, -(-self.n // 64) * 64)
        self.valid = np.arange(n_pad) < self.n

        def _pad(a, fill=0.0):
            a = np.asarray(a)
            out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
            out[:self.n] = a
            return out

        self.kind1, self.params1 = camera_jax.pack_camera(camera1)
        self.kind2, self.params2 = camera_jax.pack_camera(camera2)
        self.pts1 = _pad(np.asarray(pts1_cam, np.float32).reshape(self.n, 3))
        self.pts2 = _pad(np.asarray(pts2_cam, np.float32).reshape(self.n, 3))
        self.chi1 = _pad((self.CHI_SQ_2D
                          * np.asarray(sigma_sq1)).astype(np.float32))
        self.chi2 = _pad((self.CHI_SQ_2D
                          * np.asarray(sigma_sq2)).astype(np.float32))
        # projections of each point into its own camera (loop_ransac.cpp:43-44)
        pts1 = self.pts1[:self.n]
        pts2 = self.pts2[:self.n]
        r1, v1 = camera1.ray_to_pixel(pts1)
        v1 &= camera1.is_valid_pixel(r1)
        r2, v2 = camera2.ray_to_pixel(pts2)
        v2 &= camera2.is_valid_pixel(r2)
        self.repro1 = _pad(np.nan_to_num(r1).astype(np.float32))
        self.repro2 = _pad(np.nan_to_num(r2).astype(np.float32))
        self.vis1 = _pad(v1, fill=False)
        self.vis2 = _pad(v2, fill=False)

    def solve(self, iterations: int, dof: str = "SIM3", fix_scale: bool = False,
              min_inliers: int = 20, seed: int = 94235682) -> Sim3RansacResult:
        if self.n < 3 or self.n < min_inliers:
            return Sim3RansacResult(False, np.eye(3), np.zeros(3), 1.0,
                                    np.zeros(self.n, bool), 0)
        count, R12, t12, s12, inl = jax.device_get(_sim3_ransac_impl(
            np.uint32(seed), jnp.asarray(self.pts1), jnp.asarray(self.pts2),
            jnp.asarray(self.valid), jnp.asarray(self.repro1), jnp.asarray(self.repro2),
            jnp.asarray(self.vis1), jnp.asarray(self.vis2),
            jnp.asarray(self.chi1), jnp.asarray(self.chi2),
            jnp.asarray(self.params1), jnp.asarray(self.params2),
            self.kind1, self.kind2, dof, bool(fix_scale), int(iterations)))
        ok = int(count) >= min_inliers
        return Sim3RansacResult(ok, np.asarray(R12, np.float64), np.asarray(t12, np.float64),
                                float(s12), np.asarray(inl)[:self.n], int(count))


# ---------------------------------------------------------------------------
# Host (NumPy) Sim3 RANSAC twin — for latency-bound consumers
# ---------------------------------------------------------------------------


def _horn_sim3_np(s1: np.ndarray, s2: np.ndarray):
    """Batched Horn absolute orientation, NumPy (K hypotheses at once).

    ``s1, s2``: (K, 3, 3) with COLUMNS as corresponding points — the same
    layout and math as :func:`compute_sim3` (reference:
    loop_ransac.cpp:112-196), vectorized over the hypothesis axis with one
    batched symmetric 4x4 eigendecomposition."""
    c1 = s1.mean(axis=2)
    c2 = s2.mean(axis=2)
    a1 = s1 - c1[:, :, None]
    a2 = s2 - c2[:, :, None]
    M = a1 @ a2.transpose(0, 2, 1)                        # (K, 3, 3)
    sxx, sxy, sxz = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    syx, syy, syz = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    szx, szy, szz = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    K = len(s1)
    N = np.empty((K, 4, 4), s1.dtype)
    N[:, 0, 0] = sxx + syy + szz
    N[:, 0, 1] = N[:, 1, 0] = syz - szy
    N[:, 0, 2] = N[:, 2, 0] = szx - sxz
    N[:, 0, 3] = N[:, 3, 0] = sxy - syx
    N[:, 1, 1] = sxx - syy - szz
    N[:, 1, 2] = N[:, 2, 1] = sxy + syx
    N[:, 1, 3] = N[:, 3, 1] = szx + sxz
    N[:, 2, 2] = -sxx + syy - szz
    N[:, 2, 3] = N[:, 3, 2] = syz + szy
    N[:, 3, 3] = -sxx - syy + szz
    _, vecs = np.linalg.eigh(N)
    q = vecs[:, :, -1]                                    # (K, 4) (w, x, y, z)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((K, 3, 3), s1.dtype)
    R[:, 0, 0] = 1 - 2 * (qy * qy + qz * qz)
    R[:, 0, 1] = 2 * (qx * qy - qz * qw)
    R[:, 0, 2] = 2 * (qx * qz + qy * qw)
    R[:, 1, 0] = 2 * (qx * qy + qz * qw)
    R[:, 1, 1] = 1 - 2 * (qx * qx + qz * qz)
    R[:, 1, 2] = 2 * (qy * qz - qx * qw)
    R[:, 2, 0] = 2 * (qx * qz - qy * qw)
    R[:, 2, 1] = 2 * (qy * qz + qx * qw)
    R[:, 2, 2] = 1 - 2 * (qx * qx + qy * qy)
    a1_in_2 = R @ a1
    s = (np.sum(a2 * a1_in_2, axis=(1, 2))
         / np.maximum(np.sum(a1 * a1, axis=(1, 2)), 1e-12))
    t = c2 - s[:, None] * (R @ c1[:, :, None])[:, :, 0]
    return R, t, s


def _horn_rot_z_np(s1: np.ndarray, s2: np.ndarray):
    """Batched planar (yaw-only) Horn, NumPy twin of :func:`compute_rot_z`
    (reference: loop_ransac.cpp:277-312)."""
    c1 = s1.mean(axis=2)
    c2 = s2.mean(axis=2)
    a1 = s1 - c1[:, :, None]
    a2 = s2 - c2[:, :, None]
    C = np.sum(a1[:, :2] * a2[:, :2], axis=(1, 2))
    S = np.sum(a1[:, 0] * a2[:, 1] - a1[:, 1] * a2[:, 0], axis=1)
    norm = np.maximum(np.sqrt(C * C + S * S), 1e-12)
    ct, st = C / norm, S / norm
    K = len(s1)
    R = np.zeros((K, 3, 3), s1.dtype)
    R[:, 0, 0] = ct
    R[:, 0, 1] = -st
    R[:, 1, 0] = st
    R[:, 1, 1] = ct
    R[:, 2, 2] = 1.0
    s = (np.sum(a2 * (R @ a1), axis=(1, 2))
         / np.maximum(np.sum(a1 * a1, axis=(1, 2)), 1e-12))
    t = c2 - s[:, None] * (R @ c1[:, :, None])[:, :, 0]
    return R, t, s


def sim3_ransac_host(camera1, camera2, pts1_cam, pts2_cam,
                     sigma_sq1, sigma_sq2, iterations: int,
                     dof: str = "SIM3", fix_scale: bool = False,
                     min_inliers: int = 20,
                     seed: int = 94235682) -> Sim3RansacResult:
    """Host NumPy twin of :class:`Sim3Ransac` — the latency-bound path.

    Same algorithm as the device bank (reference: loop_ransac.cpp:47-110):
    K Horn hypotheses from random valid triples, symmetric chi2-gated
    reprojection inlier count, argmax winner. The closure consumer's
    problem is ~200 hypotheses x ~200 points — microseconds of NumPy —
    while a device dispatch costs a full tunnel round trip (~26 ms), so the
    serving path (pipeline/device_slam.py) runs it here. Results are
    equivalent, not bit-identical: hypothesis sampling uses NumPy's
    generator instead of jax.random (both deterministic per seed).
    """
    n = len(pts1_cam)
    if n < 3 or n < min_inliers:
        return Sim3RansacResult(False, np.eye(3), np.zeros(3), 1.0,
                                np.zeros(n, bool), 0)
    pts1 = np.asarray(pts1_cam, np.float64).reshape(n, 3)
    pts2 = np.asarray(pts2_cam, np.float64).reshape(n, 3)
    chi1 = Sim3Ransac.CHI_SQ_2D * np.asarray(sigma_sq1, np.float64)
    chi2 = Sim3Ransac.CHI_SQ_2D * np.asarray(sigma_sq2, np.float64)
    repro1, vis1 = camera1.ray_to_pixel(pts1)
    vis1 = vis1 & camera1.is_valid_pixel(repro1)
    repro2, vis2 = camera2.ray_to_pixel(pts2)
    vis2 = vis2 & camera2.is_valid_pixel(repro2)
    repro1 = np.nan_to_num(repro1)
    repro2 = np.nan_to_num(repro2)

    rng = np.random.default_rng(seed)
    keys = rng.random((int(iterations), n))
    idx = np.argpartition(keys, 2, axis=1)[:, :3]         # 3 distinct indices
    s1 = pts1[idx].transpose(0, 2, 1)                     # (K, 3, 3) columns
    s2 = pts2[idx].transpose(0, 2, 1)

    solver = _horn_rot_z_np if dof == "ZROT" else _horn_sim3_np
    R21, t21, s21 = solver(s1, s2)
    if fix_scale:
        s21 = np.ones_like(s21)
    s12 = 1.0 / np.where(np.abs(s21) > 1e-12, s21, 1e-12)
    R12 = R21.transpose(0, 2, 1)
    t12 = -s12[:, None] * (R12 @ t21[:, :, None])[:, :, 0]

    K = len(R21)
    # batched BLAS matmuls, not einsum: p @ (sR)^T per hypothesis — einsum
    # lowers this contraction to a slow generic loop (~15 ms/call measured)
    p1_in_2 = (pts1[None] @ (R21 * s21[:, None, None]).transpose(0, 2, 1)
               + t21[:, None, :])                          # (K, N, 3)
    p2_in_1 = (pts2[None] @ (R12 * s12[:, None, None]).transpose(0, 2, 1)
               + t12[:, None, :])
    proj1_in_2, v12 = camera2.ray_to_pixel(p1_in_2.reshape(-1, 3))
    proj2_in_1, v21 = camera1.ray_to_pixel(p2_in_1.reshape(-1, 3))
    err2 = np.sum((np.nan_to_num(proj1_in_2).reshape(K, n, 2)
                   - repro2[None]) ** 2, axis=-1)
    err1 = np.sum((np.nan_to_num(proj2_in_1).reshape(K, n, 2)
                   - repro1[None]) ** 2, axis=-1)
    ok = (vis1[None] & vis2[None]
          & v12.reshape(K, n) & v21.reshape(K, n)
          & (err2 < chi2[None]) & (err1 < chi1[None]))
    counts = ok.sum(axis=1)
    best = int(np.argmax(counts))
    num = int(counts[best])
    return Sim3RansacResult(num >= min_inliers, R12[best], t12[best],
                            float(s12[best]), ok[best], num)


# ---------------------------------------------------------------------------
# Essential matrix: 8-point solver + RANSAC
# ---------------------------------------------------------------------------


def compute_E_8pt(b1, b2):
    """Essential matrix from >= 8 bearing pairs (reference:
    essential_solver.cc:87-118): nullspace of the stacked constraint matrix,
    then rank-2 projection."""
    b1 = jnp.asarray(b1)
    b2 = jnp.asarray(b2)
    A = jnp.concatenate([
        b2[:, 0:1] * b1, b2[:, 1:2] * b1, b2[:, 2:3] * b1], axis=1)  # (N, 9)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    e = vecs[:, 0]
    E_init = e.reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E_init)
    s = s.at[2].set(0.0)
    return (U * s[None, :]) @ Vt


def _essential_residuals(E_21, b1, b2):
    """Symmetric epipolar cosine residuals (essential_solver.cc:164-215)."""
    ep2 = b1 @ E_21.T                  # epiplane of each b1 in cam2  (N, 3)
    r2 = jnp.abs(jnp.sum(ep2 * b2, axis=1)) / jnp.maximum(jnp.linalg.norm(ep2, axis=1), 1e-12)
    ep1 = b2 @ E_21                    # E_12 = E_21^T
    r1 = jnp.abs(jnp.sum(ep1 * b1, axis=1)) / jnp.maximum(jnp.linalg.norm(ep1, axis=1), 1e-12)
    return r1, r2


ESSENTIAL_RESIDUAL_COS_THR = 0.01745240643  # 1 degree, essential_solver.cc:174


def _essential_ransac_core(keys, b1, b2, valid):
    """Hypothesis bank from explicit ``keys`` (K, 2); shared by the jitted
    single-chip entry and the sharded multi-chip step."""
    n = b1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.sum(p)

    def sample(k):
        return jax.random.choice(k, n, shape=(8,), replace=False, p=p)

    idx = jax.vmap(sample)(keys)                       # (K, 8)
    Es = jax.vmap(compute_E_8pt)(b1[idx], b2[idx])     # (K, 3, 3)

    def score(E):
        r1, r2 = _essential_residuals(E, b1, b2)
        inl = (r1 < ESSENTIAL_RESIDUAL_COS_THR) & (r2 < ESSENTIAL_RESIDUAL_COS_THR) & valid
        sc = jnp.sum(jnp.where(inl, r1 + r2, 0.0))
        return sc, inl

    scores, inliers = jax.vmap(score)(Es)
    best = jnp.argmax(scores)
    return Es[best], scores[best], inliers[best]


@functools.partial(jax.jit, static_argnames=("iterations",))
def _essential_ransac_impl(seed, b1, b2, valid, iterations):
    keys = jax.random.split(jax.random.PRNGKey(seed), iterations)
    with jax.default_matmul_precision("highest"):  # see _sim3_ransac_impl
        return _essential_ransac_core(keys, b1, b2, valid)


def decompose_E_jax(E_21):
    """E -> the 4 candidate (R, t) pairs, on device (reference:
    essential_solver.cc:120-147; device twin of :func:`decompose_E`)."""
    U, _, Vt = jnp.linalg.svd(E_21)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E_21.dtype)
    R1 = U @ W @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = U @ W.T @ Vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def triangulate_two_view_jax(R_21, t_21, b1, b2):
    """Batched two-view midpoint triangulation on device.

    ``R_21, t_21``: pose of camera 1 expressed in camera 2 (p2 = R21 p1 + t21);
    ``b1, b2``: (N, 3) bearing vectors. Returns (N, 3) points in camera-1
    coordinates and an (N,) front-of-both-cameras mask (the cheirality test of
    the reference's ``check_inliers``-style candidate selection).
    """
    # rays in camera-1 frame: d1 = b1 from origin 0; camera-2 center in
    # cam1 coords is c2 = -R21^T t21, ray direction R21^T b2
    c2 = -R_21.T @ t_21
    d1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    d2 = b2 @ R_21  # == (R21^T b2^T)^T
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)
    eye = jnp.eye(3, dtype=b1.dtype)
    M1 = eye[None] - d1[:, :, None] * d1[:, None, :]
    M2 = eye[None] - d2[:, :, None] * d2[:, None, :]
    A = M1 + M2
    rhs = jnp.einsum("nij,j->ni", M2, c2)
    # damped solve keeps degenerate (parallel-ray) systems finite; those
    # points are masked out by the cheirality/parallax test below
    pts = jnp.linalg.solve(A + 1e-6 * eye[None], rhs[..., None])[..., 0]
    z1 = jnp.einsum("ni,ni->n", pts, d1)
    z2 = jnp.einsum("ni,ni->n", pts - c2[None], d2)
    parallax = jnp.einsum("ni,ni->n", d1, d2)
    ok = (z1 > 1e-6) & (z2 > 1e-6) & (parallax < 1.0 - 1e-7)
    return pts, ok


def recover_pose_from_E_jax(E_21, b1, b2, valid):
    """Pick the (R, t) of the 4 E decompositions with the most points in
    front of both cameras (reference: essential_solver.cc pose recovery via
    check_inliers on each candidate). Returns (R_21, t_21, pts_cam1, ok)."""
    Rs, ts = decompose_E_jax(E_21)
    pts4, ok4 = jax.vmap(lambda R, t: triangulate_two_view_jax(R, t, b1, b2))(Rs, ts)
    counts = jnp.sum(ok4 & valid[None], axis=1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], pts4[best], ok4[best] & valid


class EssentialRansacResult(NamedTuple):
    ok: bool
    E_21: np.ndarray
    inliers: np.ndarray
    score: float


def essential_ransac(bearings_1: np.ndarray, bearings_2: np.ndarray,
                     iterations: int = 100, seed: int = 94235682,
                     recompute: bool = True) -> EssentialRansacResult:
    """Find E_21 by RANSAC over bearing correspondences
    (reference: essential_solver.cc:11-85)."""
    n = len(bearings_1)
    if n < 8:
        return EssentialRansacResult(False, np.eye(3), np.zeros(n, bool), 0.0)
    b1 = jnp.asarray(bearings_1, jnp.float32)
    b2 = jnp.asarray(bearings_2, jnp.float32)
    E, score, inl = jax.device_get(_essential_ransac_impl(
        np.uint32(seed), b1, b2, jnp.ones(n, bool), int(iterations)))
    num = int(inl.sum())
    ok = (float(score) > 0.0) and num >= 8
    if ok and recompute:
        # final all-inlier refit in f64 on host: one 9x9 eigh + 3x3 SVD; the
        # f32 device path is plenty for hypothesis scoring but the refined E
        # benefits from the extra precision (essential_solver.cc:71-84)
        s1 = np.asarray(bearings_1, np.float64)[inl]
        s2 = np.asarray(bearings_2, np.float64)[inl]
        A = np.concatenate([s2[:, 0:1] * s1, s2[:, 1:2] * s1, s2[:, 2:3] * s1], axis=1)
        _, vecs = np.linalg.eigh(A.T @ A)
        U, s, Vt = np.linalg.svd(vecs[:, 0].reshape(3, 3))
        s[2] = 0.0
        E = (U * s[None, :]) @ Vt
        ep2 = np.asarray(bearings_1) @ E.T
        r2 = np.abs(np.sum(ep2 * bearings_2, axis=1)) / np.maximum(np.linalg.norm(ep2, axis=1), 1e-12)
        ep1 = np.asarray(bearings_2) @ E
        r1 = np.abs(np.sum(ep1 * bearings_1, axis=1)) / np.maximum(np.linalg.norm(ep1, axis=1), 1e-12)
        inl = (r1 < ESSENTIAL_RESIDUAL_COS_THR) & (r2 < ESSENTIAL_RESIDUAL_COS_THR)
    return EssentialRansacResult(ok, np.asarray(E, np.float64), np.asarray(inl), float(score))


def decompose_E(E_21: np.ndarray):
    """E -> 4 candidate (R, t) pairs (reference: essential_solver.cc:120-147)."""
    U, _, Vt = np.linalg.svd(E_21)
    t = U[:, 2]
    t = t / np.linalg.norm(t)
    W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    if np.linalg.det(R1) < 0:
        R1 = -R1
    R2 = U @ W.T @ Vt
    if np.linalg.det(R2) < 0:
        R2 = -R2
    return [R1, R1, R2, R2], [t, -t, t, -t]
