"""RANSAC solver tests.

Ports the reference's five Catch2 property tests of computeSim3/computeRotZ
(reference: _unit_test_slam_ransac.cpp:13-194) and adds essential-matrix and
full Sim3-RANSAC coverage.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_tpu.geometry import se3
from slam_tpu.geometry.camera import default_camera
from slam_tpu.ops import ransac

PTS1 = np.array([
    [3.40188, 2.9844, -1.64777],
    [-1.05617, 4.11647, 2.6823],
    [2.83099, -3.02449, -2.22225],
])


def axis_angle(rad, axis):
    v = np.zeros(3)
    v[axis] = rad
    return se3.so3_exp(v)


class TestComputeSim3:
    def test_exact_recovery(self):
        """_unit_test_slam_ransac.cpp:13-49"""
        rot = (axis_angle(0.653 * np.pi, 0) @ axis_angle(-1.02 * np.pi, 1)
               @ axis_angle(0.13 * np.pi, 2))
        trans = np.array([3.13321, -1.05617, 2.83099])
        pts2 = rot @ PTS1 + trans[:, None]
        R, t, s = (np.asarray(x) for x in ransac.compute_sim3(PTS1, pts2))
        assert np.square(R - rot).sum() < 0.001
        assert np.linalg.norm(t - trans) < 0.001
        assert abs(s - 1.0) < 1e-4


class TestComputeRotZ:
    def test_exact_recovery(self):
        """_unit_test_slam_ransac.cpp:51-85"""
        rot = axis_angle(0.653 * np.pi, 2)
        trans = np.array([3.13321, -1.05617, 2.83099])
        pts2 = rot @ PTS1 + trans[:, None]
        R, t, s = (np.asarray(x) for x in ransac.compute_rot_z(PTS1, pts2))
        assert np.square(R - rot).sum() < 0.001
        assert np.linalg.norm(t - trans) < 0.001
        assert abs(s - 1.0) < 1e-4

    def test_scale_recovery(self):
        """_unit_test_slam_ransac.cpp:87-123"""
        rot = axis_angle(0.653 * np.pi, 2)
        trans = np.array([3.13321, -1.05617, 2.83099])
        scale = 1.3211
        pts2 = scale * (rot @ PTS1) + trans[:, None]
        R, t, s = (np.asarray(x) for x in ransac.compute_rot_z(PTS1, pts2))
        assert np.square(R - rot).sum() < 0.001
        assert np.linalg.norm(t - trans) < 0.001
        assert abs(s - scale) < 1e-3

    def test_random_cases(self):
        """_unit_test_slam_ransac.cpp:125-157"""
        rng = np.random.default_rng(3249)
        for _ in range(100):
            pts1 = rng.uniform(-5, 5, (3, 3))
            rot = axis_angle(rng.uniform(-1, 1) * np.pi, 2)
            trans = rng.uniform(-5, 5, 3)
            pts2 = rot @ pts1 + trans[:, None]
            R, t, s = (np.asarray(x) for x in ransac.compute_rot_z(pts1, pts2))
            assert np.square(R - rot).sum() < 0.001
            assert np.linalg.norm(t - trans) < 0.001
            assert abs(s - 1.0) < 1e-3

    def test_random_cases_with_noise(self):
        """_unit_test_slam_ransac.cpp:159-194"""
        rng = np.random.default_rng(2432)
        for _ in range(100):
            pts1 = rng.uniform(-5, 5, (3, 3))
            rot = axis_angle(rng.uniform(-1, 1) * np.pi + rng.uniform(-1, 1) * 0.05, 2)
            trans = rng.uniform(-5, 5, 3)
            pts2 = rot @ pts1 + (trans + rng.uniform(-1, 1, 3) * 0.1)[:, None]
            R, t, s = (np.asarray(x) for x in ransac.compute_rot_z(pts1, pts2))
            assert np.square(R - rot).sum() < 0.2
            assert np.linalg.norm(t - trans) < 0.2
            assert abs(s - 1.0) < 0.1


class TestEssential:
    def _scene(self, n=60, noise=0.0, outliers=0):
        rng = np.random.default_rng(5)
        R2 = se3.so3_exp(np.array([0.02, 0.15, -0.03]))
        c2 = np.array([0.8, 0.1, 0.0])
        t2 = -R2 @ c2
        pts = rng.uniform([-2, -2, 3], [2, 2, 8], (n, 3))
        b1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        p2 = pts @ R2.T + t2
        b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        if noise:
            b1 = b1 + rng.normal(0, noise, b1.shape)
            b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
        if outliers:
            b2[:outliers] = rng.normal(size=(outliers, 3))
            b2[:outliers] /= np.linalg.norm(b2[:outliers], axis=1, keepdims=True)
        return b1, b2, R2, t2

    def test_8pt_exact(self):
        b1, b2, R2, t2 = self._scene()
        E = np.asarray(ransac.compute_E_8pt(jnp.asarray(b1), jnp.asarray(b2)))
        want = np.asarray(
            np.cross(np.eye(3), t2) @ R2  # skew(t) @ R with numpy cross trick
        )
        # E is up to scale/sign: compare normalized
        En = E / np.linalg.norm(E)
        Wn = want / np.linalg.norm(want)
        assert min(np.abs(En - Wn).max(), np.abs(En + Wn).max()) < 1e-4

    def test_ransac_with_outliers(self):
        b1, b2, R2, t2 = self._scene(n=80, noise=1e-4, outliers=20)
        res = ransac.essential_ransac(b1, b2, iterations=200)
        assert res.ok
        assert res.inliers[20:].mean() >= 0.85  # genuine matches kept (pairs
        # near the epipole have unstable residuals and may drop out)
        assert res.inliers[:20].mean() < 0.3   # outliers rejected
        # decompose returns a candidate close to the true rotation
        rots, transes = ransac.decompose_E(res.E_21)
        best = min(np.abs(r - R2).max() for r in rots)
        assert best < 0.05  # ~3 deg: 8-point accuracy with noise + outliers

    def test_too_few_matches(self):
        b1 = np.random.default_rng(0).normal(size=(5, 3))
        res = ransac.essential_ransac(b1, b1, iterations=10)
        assert not res.ok


class TestSim3Ransac:
    def test_recovers_transform_with_outliers(self):
        rng = np.random.default_rng(11)
        cam = default_camera()
        n = 40
        # map points seen in camera 1
        pts1 = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 7.0], (n, 3))
        # true transform 2<-1
        R21 = se3.so3_exp(np.array([0.03, 0.5, -0.02]))
        t21 = np.array([0.4, -0.2, 0.5])
        pts2 = pts1 @ R21.T + t21
        # corrupt some correspondences
        pts2[:8] += rng.uniform(1.0, 2.0, (8, 3))
        sig = np.ones(n)
        lr = ransac.Sim3Ransac(cam, cam, pts1, pts2, sig, sig)
        res = lr.solve(iterations=200, dof="SIM3", fix_scale=True, min_inliers=15)
        assert res.ok
        assert res.num_inliers >= 25
        # result is transform 1<-2; invert to compare
        R12, t12 = res.rot_12, res.trans_12
        R21_est = R12.T
        t21_est = -R21_est @ t12
        assert np.abs(R21_est - R21).max() < 0.02
        assert np.linalg.norm(t21_est - t21) < 0.1

    def test_zrot_mode(self):
        rng = np.random.default_rng(13)
        cam = default_camera()
        n = 30
        pts1 = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 7.0], (n, 3))
        R21 = se3.so3_exp(np.array([0.0, 0.0, 0.3]))
        t21 = np.array([0.2, 0.1, -0.1])
        pts2 = pts1 @ R21.T + t21
        lr = ransac.Sim3Ransac(cam, cam, pts1, pts2, np.ones(n), np.ones(n))
        res = lr.solve(iterations=100, dof="ZROT", fix_scale=True, min_inliers=15)
        assert res.ok
        R21_est = res.rot_12.T
        assert np.abs(R21_est - R21).max() < 0.02

    def test_insufficient_matches(self):
        cam = default_camera()
        pts = np.array([[0.0, 0.0, 3.0], [1.0, 0.0, 3.0]])
        lr = ransac.Sim3Ransac(cam, cam, pts, pts, np.ones(2), np.ones(2))
        res = lr.solve(iterations=10, min_inliers=5)
        assert not res.ok

    def test_deterministic_given_seed(self):
        rng = np.random.default_rng(17)
        cam = default_camera()
        pts1 = rng.uniform([-1, -1, 3], [1, 1, 6], (25, 3))
        pts2 = pts1 + rng.normal(0, 0.01, pts1.shape)
        lr = ransac.Sim3Ransac(cam, cam, pts1, pts2, np.ones(25), np.ones(25))
        r1 = lr.solve(iterations=50, seed=123)
        r2 = lr.solve(iterations=50, seed=123)
        assert np.array_equal(r1.inliers, r2.inliers)
        assert np.allclose(r1.rot_12, r2.rot_12)


class TestSim3RansacHost:
    """NumPy twin of the Sim3 RANSAC (ransac.sim3_ransac_host): the closure
    consumer's latency-bound path. Must be behaviorally equivalent to the
    device bank — same Horn math, same symmetric chi2 gate."""

    def _scene(self, n=40, outliers=8, seed=11):
        rng = np.random.default_rng(seed)
        cam = default_camera()
        pts1 = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 7.0], (n, 3))
        R21 = se3.so3_exp(np.array([0.03, 0.5, -0.02]))
        t21 = np.array([0.4, -0.2, 0.5])
        pts2 = pts1 @ R21.T + t21
        pts2[:outliers] += rng.uniform(1.0, 2.0, (outliers, 3))
        return cam, pts1, pts2, R21, t21

    def test_recovers_transform_with_outliers(self):
        cam, pts1, pts2, R21, t21 = self._scene()
        n = len(pts1)
        res = ransac.sim3_ransac_host(cam, cam, pts1, pts2,
                                      np.ones(n), np.ones(n),
                                      iterations=200, dof="SIM3",
                                      fix_scale=True, min_inliers=15)
        assert res.ok
        assert res.num_inliers >= 25
        R21_est = res.rot_12.T
        t21_est = -R21_est @ res.trans_12
        assert np.abs(R21_est - R21).max() < 0.02
        assert np.linalg.norm(t21_est - t21) < 0.1
        # outlier rows must not be inliers of the winner
        assert res.inliers[:8].sum() == 0

    def test_matches_device_impl(self):
        """Host and device RANSAC must agree on the recovered transform
        (independent sampling, same clean consensus set)."""
        cam, pts1, pts2, _, _ = self._scene()
        n = len(pts1)
        host = ransac.sim3_ransac_host(cam, cam, pts1, pts2,
                                       np.ones(n), np.ones(n),
                                       iterations=200, fix_scale=True,
                                       min_inliers=15)
        dev = ransac.Sim3Ransac(cam, cam, pts1, pts2,
                                np.ones(n), np.ones(n)).solve(
            200, dof="SIM3", fix_scale=True, min_inliers=15)
        assert host.ok and dev.ok
        assert np.abs(host.rot_12 - dev.rot_12).max() < 5e-3
        assert np.linalg.norm(host.trans_12 - dev.trans_12) < 5e-2
        # inlier sets agree on the clean rows
        assert (host.inliers[8:] == dev.inliers[8:]).mean() > 0.9

    def test_zrot_and_scale(self):
        rng = np.random.default_rng(13)
        cam = default_camera()
        n = 30
        pts1 = rng.uniform([-1.5, -1.0, 3.0], [1.5, 1.0, 7.0], (n, 3))
        R21 = se3.so3_exp(np.array([0.0, 0.0, 0.3]))
        t21 = np.array([0.2, 0.1, -0.1])
        pts2 = pts1 @ R21.T + t21
        res = ransac.sim3_ransac_host(cam, cam, pts1, pts2,
                                      np.ones(n), np.ones(n),
                                      iterations=100, dof="ZROT",
                                      fix_scale=True, min_inliers=15)
        assert res.ok
        assert np.abs(res.rot_12.T - R21).max() < 0.02
        # free scale recovers a scaled correspondence set
        s_true = 1.2
        res_s = ransac.sim3_ransac_host(cam, cam, pts1, s_true * (pts1 @ R21.T) + t21,
                                        np.ones(n), np.ones(n),
                                        iterations=100, dof="SIM3",
                                        fix_scale=False, min_inliers=15)
        assert res_s.ok
        assert abs(1.0 / res_s.scale_12 - s_true) < 0.02

    def test_per_octave_sigma_gate(self):
        """The chi2 inlier gate scales with per-match levelSigmaSq
        (reference: loop_ransac.cpp:28-40): a match whose reprojection
        noise exceeds the level-0 gate must be an inlier at a coarser
        octave's sigma — and host/device must agree on the decision."""
        rng = np.random.default_rng(21)
        cam = default_camera()
        n = 30
        pts1 = rng.uniform([-1.0, -0.8, 3.0], [1.0, 0.8, 6.0], (n, 3))
        pts2 = pts1.copy()
        # perturb one point by ~5 px at its depth (gate at sigma=1 is
        # sqrt(9.21) ~ 3 px; at sigma_sq = 1.2^(2*4) ~ 4.3 -> ~6.3 px)
        f = cam.fx
        pts2[0, 0] += 5.0 * pts2[0, 2] / f
        sig_lo = np.ones(n)
        sig_hi = np.ones(n)
        sig_hi[0] = 1.2 ** 8
        res_lo = ransac.sim3_ransac_host(cam, cam, pts1, pts2, sig_lo,
                                         sig_lo, iterations=100,
                                         fix_scale=True, min_inliers=10)
        res_hi = ransac.sim3_ransac_host(cam, cam, pts1, pts2, sig_hi,
                                         sig_hi, iterations=100,
                                         fix_scale=True, min_inliers=10)
        assert res_lo.ok and res_hi.ok
        assert not res_lo.inliers[0]
        assert res_hi.inliers[0]
        dev_lo = ransac.Sim3Ransac(cam, cam, pts1, pts2, sig_lo,
                                   sig_lo).solve(100, fix_scale=True,
                                                 min_inliers=10)
        dev_hi = ransac.Sim3Ransac(cam, cam, pts1, pts2, sig_hi,
                                   sig_hi).solve(100, fix_scale=True,
                                                 min_inliers=10)
        assert not dev_lo.inliers[0]
        assert dev_hi.inliers[0]

    def test_insufficient_matches(self):
        cam = default_camera()
        pts = np.array([[0.0, 0.0, 3.0], [1.0, 0.0, 3.0]])
        res = ransac.sim3_ransac_host(cam, cam, pts, pts, np.ones(2),
                                      np.ones(2), iterations=10,
                                      min_inliers=5)
        assert not res.ok

    def test_deterministic_given_seed(self):
        rng = np.random.default_rng(17)
        cam = default_camera()
        pts1 = rng.uniform([-1, -1, 3], [1, 1, 6], (25, 3))
        pts2 = pts1 + rng.normal(0, 0.01, pts1.shape)
        r1 = ransac.sim3_ransac_host(cam, cam, pts1, pts2, np.ones(25),
                                     np.ones(25), iterations=50, seed=123)
        r2 = ransac.sim3_ransac_host(cam, cam, pts1, pts2, np.ones(25),
                                     np.ones(25), iterations=50, seed=123)
        assert np.array_equal(r1.inliers, r2.inliers)
        assert np.allclose(r1.rot_12, r2.rot_12)


class TestSim3RefineHost:
    """NumPy twin of the Sim3 refinement (sim3_opt.optimize_sim3_transform_host)."""

    def test_refines_and_matches_device(self):
        from slam_tpu.ops.sim3_opt import (optimize_sim3_transform,
                                           optimize_sim3_transform_host)
        rng = np.random.default_rng(9)
        n = 40
        pts2 = rng.uniform([-1, -1, 3], [1, 1, 7], (n, 3))
        R_true = se3.so3_exp(np.array([0.05, 0.3, -0.04]))
        t_true = np.array([0.3, -0.1, 0.4])
        pts1 = pts2 @ R_true.T + t_true
        obs1 = pts1[:, :2] / pts1[:, 2:3]
        obs2 = pts2[:, :2] / pts2[:, 2:3]
        R0 = se3.so3_exp(np.array([0.02, -0.03, 0.01])) @ R_true
        t0 = t_true + np.array([0.05, -0.04, 0.06])
        R, t, s = optimize_sim3_transform_host(
            R0, t0, 1.0, pts1, pts2, obs1, obs2,
            np.ones(n), np.ones(n), inlier_threshold=10.0, fix_scale=True)
        assert np.abs(R - R_true).max() < 5e-3
        assert np.linalg.norm(t - t_true) < 2e-2
        assert abs(s - 1.0) < 1e-9
        Rd, td, sd = optimize_sim3_transform(
            R0, t0, 1.0, pts1, pts2, obs1, obs2,
            np.ones(n), np.ones(n), inlier_threshold=10.0, fix_scale=True)
        assert np.abs(R - Rd).max() < 5e-3
        assert np.linalg.norm(t - td) < 2e-2

    def test_scale_estimation(self):
        from slam_tpu.ops.sim3_opt import optimize_sim3_transform_host
        rng = np.random.default_rng(10)
        n = 30
        pts2 = rng.uniform([-1, -1, 3], [1, 1, 7], (n, 3))
        s_true = 1.25
        pts1 = s_true * pts2 + np.array([0.1, 0.0, 0.2])
        obs1 = pts1[:, :2] / pts1[:, 2:3]
        obs2 = pts2[:, :2] / pts2[:, 2:3]
        R, t, s = optimize_sim3_transform_host(
            np.eye(3), np.array([0.08, 0.01, 0.15]), 1.1,
            pts1, pts2, obs1, obs2, np.ones(n), np.ones(n),
            inlier_threshold=10.0, fix_scale=False)
        assert abs(s - s_true) < 0.02
