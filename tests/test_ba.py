"""Tests for the XLA Levenberg-Marquardt bundle-adjustment core."""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_tpu.geometry import se3
from slam_tpu.ops import ba, lie


def make_problem(n_kf=6, n_mp=40, pose_noise=0.02, point_noise=0.05,
                 fix_first=True, focal=450.0, pose_edges=False,
                 meas_noise=0.0, seed=21):
    """Synthetic scene: camera moving along x, landmarks in front."""
    rng = np.random.default_rng(seed)
    true_poses = []
    for i in range(n_kf):
        R = se3.so3_exp(np.array([0.0, 0.03 * i, 0.0]))
        c = np.array([0.4 * i, 0.0, 0.0])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ c
        true_poses.append(T)
    true_points = rng.uniform([-2, -1.5, 4], [2 + 0.4 * n_kf, 1.5, 9], (n_mp, 3))

    obs_kf, obs_mp, obs_meas = [], [], []
    for k, T in enumerate(true_poses):
        pc = true_points @ T[:3, :3].T + T[:3, 3]
        meas = pc[:, :2] / pc[:, 2:3]
        if meas_noise:
            meas = meas + rng.normal(0, meas_noise, meas.shape)
        for j in range(n_mp):
            obs_kf.append(k)
            obs_mp.append(j)
            obs_meas.append(meas[j])

    # perturb initial states
    init_poses = []
    for i, T in enumerate(true_poses):
        if fix_first and i == 0:
            init_poses.append(T)
        else:
            xi = rng.normal(0, pose_noise, 6)
            init_poses.append(se3.se3_exp(xi) @ T)
    init_points = true_points + rng.normal(0, point_noise, true_points.shape)

    O = len(obs_kf)
    E = max(n_kf - 1, 1)
    pe_a = np.arange(1, n_kf, dtype=np.int32)
    pe_b = np.arange(0, n_kf - 1, dtype=np.int32)
    pe_meas = np.stack([true_poses[b] @ np.linalg.inv(true_poses[a])
                        for a, b in zip(pe_a, pe_b)]) if n_kf > 1 else np.eye(4)[None]
    pe_sqrt = np.stack([np.eye(6) * 10.0] * len(pe_a)) if n_kf > 1 else np.eye(6)[None]
    problem = ba.BAProblem(
        poses=jnp.asarray(np.stack(init_poses), jnp.float32),
        pose_fixed=jnp.asarray([fix_first and i == 0 for i in range(n_kf)]),
        points=jnp.asarray(init_points, jnp.float32),
        points_fixed=jnp.zeros(n_mp, bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_mp=jnp.asarray(obs_mp, jnp.int32),
        obs_meas=jnp.asarray(np.array(obs_meas), jnp.float32),
        obs_sqrt_info=jnp.full((O,), focal, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        pe_a=jnp.asarray(pe_a if n_kf > 1 else [0], jnp.int32),
        pe_b=jnp.asarray(pe_b if n_kf > 1 else [0], jnp.int32),
        pe_meas=jnp.asarray(pe_meas, jnp.float32),
        pe_sqrt_info=jnp.asarray(pe_sqrt, jnp.float32),
        pe_valid=jnp.asarray([pose_edges] * len(pe_a) if n_kf > 1 else [False]),
        pr_idx=jnp.zeros(1, jnp.int32),
        pr_meas=jnp.asarray(np.eye(4)[None], jnp.float32),
        pr_sqrt_info=jnp.zeros((1, 6, 6), jnp.float32),
        pr_valid=jnp.zeros(1, bool),
    )
    return problem, np.stack(true_poses), true_points


def reproj_rms(poses, points, problem):
    T = np.asarray(poses)[np.asarray(problem.obs_kf)]
    X = np.asarray(points)[np.asarray(problem.obs_mp)]
    pc = np.einsum("oij,oj->oi", T[:, :3, :3], X) + T[:, :3, 3]
    pred = pc[:, :2] / pc[:, 2:3]
    err = pred - np.asarray(problem.obs_meas)
    return float(np.sqrt((err ** 2).sum(1).mean()))


class TestLie:
    def test_exp_log_roundtrip_batched(self):
        rng = np.random.default_rng(1)
        xi = rng.normal(0, 0.5, (32, 6)).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        back = np.asarray(lie.se3_log(T))
        assert np.allclose(back, xi, atol=1e-4)

    def test_matches_host_se3(self):
        xi = np.array([0.1, -0.2, 0.3, 1.0, 2.0, -0.5])
        Tj = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        Th = se3.se3_exp(xi)
        assert np.allclose(Tj, Th, atol=1e-5)

    def test_inverse(self):
        rng = np.random.default_rng(2)
        xi = rng.normal(0, 0.4, (8, 6)).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        I = np.asarray(lie.se3_inverse(T) @ T)
        assert np.allclose(I, np.eye(4), atol=1e-5)


class TestSolveBA:
    def test_full_ba_converges(self):
        problem, true_poses, true_points = make_problem()
        before = reproj_rms(problem.poses, problem.points, problem)
        res = ba.solve_ba(problem, iterations=10, cg_iters=40)
        after = reproj_rms(res.poses, res.points, problem)
        assert after < before * 0.01, (before, after)
        # fixed first pose untouched
        assert np.allclose(np.asarray(res.poses)[0], true_poses[0], atol=1e-6)

    def test_pose_only_ba(self):
        problem, true_poses, _ = make_problem(n_kf=2, n_mp=30, point_noise=0.0)
        problem = problem._replace(
            points_fixed=jnp.ones(problem.points.shape[0], bool),
            pose_fixed=jnp.asarray([True, False]))
        res = ba.solve_ba(problem, iterations=10, cg_iters=20)
        # points unchanged, free pose recovered
        assert np.allclose(np.asarray(res.points), np.asarray(problem.points))
        err = np.asarray(res.poses)[1] - true_poses[1]
        assert np.abs(err).max() < 1e-3

    def test_pose_edges_alone_align_chain(self):
        # no observations: odometry edges should pull the noisy chain to the
        # measured deltas
        problem, true_poses, _ = make_problem(n_kf=5, n_mp=2, pose_edges=True)
        problem = problem._replace(obs_valid=jnp.zeros_like(problem.obs_valid))
        res = ba.solve_ba(problem, iterations=15, cg_iters=40)
        poses = np.asarray(res.poses, np.float64)
        for a, b in zip(problem.pe_a, problem.pe_b):
            got = poses[int(b)] @ np.linalg.inv(poses[int(a)])
            want = true_poses[int(b)] @ np.linalg.inv(true_poses[int(a)])
            assert np.abs(got - want).max() < 5e-3

    def test_huber_downweights_outliers(self):
        # pose_edges pin the gauge (monocular reprojection alone leaves the
        # scale free, so position-vs-truth would measure gauge drift)
        problem, true_poses, true_points = make_problem(meas_noise=0.0005,
                                                        pose_edges=True)
        # corrupt 5% of measurements badly
        meas = np.asarray(problem.obs_meas).copy()
        n_bad = len(meas) // 20
        meas[:n_bad] += 0.5
        problem = problem._replace(obs_meas=jnp.asarray(meas))
        res = ba.solve_ba(problem, iterations=10, cg_iters=40)
        # outlier observations show huge final chi2; inliers small
        chi2 = np.asarray(res.obs_chi2)
        assert np.median(chi2[:n_bad]) > 100 * np.median(chi2[n_bad:])
        # estimates stay close to truth despite outliers
        pos_err = [np.linalg.norm(se3.camera_center(np.asarray(res.poses[i], np.float64))
                                  - se3.camera_center(true_poses[i]))
                   for i in range(len(true_poses))]
        assert max(pos_err) < 0.05

    def test_prior_anchors_orientation(self):
        # single free pose, no obs: a rotation-only prior should rotate it
        # toward the target without moving the position much
        T0 = se3.se3_exp(np.array([0.3, 0.1, -0.2, 1.0, 2.0, 3.0]))
        target = se3.se3_exp(np.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0]))
        sqrt_info = np.zeros((6, 6))
        sqrt_info[:3, :3] = np.eye(3) * 100.0
        problem = ba.BAProblem(
            poses=jnp.asarray(T0[None], jnp.float32),
            pose_fixed=jnp.zeros(1, bool),
            points=jnp.zeros((1, 3), jnp.float32),
            points_fixed=jnp.ones(1, bool),
            obs_kf=jnp.zeros(1, jnp.int32), obs_mp=jnp.zeros(1, jnp.int32),
            obs_meas=jnp.zeros((1, 2), jnp.float32),
            obs_sqrt_info=jnp.zeros(1, jnp.float32),
            obs_valid=jnp.zeros(1, bool),
            pe_a=jnp.zeros(1, jnp.int32), pe_b=jnp.zeros(1, jnp.int32),
            pe_meas=jnp.asarray(np.eye(4)[None], jnp.float32),
            pe_sqrt_info=jnp.zeros((1, 6, 6), jnp.float32),
            pe_valid=jnp.zeros(1, bool),
            pr_idx=jnp.zeros(1, jnp.int32),
            pr_meas=jnp.asarray(target[None], jnp.float32),
            pr_sqrt_info=jnp.asarray(sqrt_info[None], jnp.float32),
            pr_valid=jnp.ones(1, bool),
        )
        res = ba.solve_ba(problem, iterations=10, cg_iters=10)
        R_est = np.asarray(res.poses)[0][:3, :3]
        assert np.abs(R_est - target[:3, :3]).max() < 1e-3


class TestPackedSolve:
    def test_packed_matches_unpacked(self):
        import jax
        problem, _, _ = make_problem()
        K, M = problem.poses.shape[0], problem.points.shape[0]
        O, E, P = (problem.obs_kf.shape[0], problem.pe_a.shape[0],
                   problem.pr_idx.shape[0])
        want = jax.device_get(ba.solve_ba(problem, iterations=4, cg_iters=0))
        f32, i32, b8 = ba.pack_problem(jax.tree.map(np.asarray, problem))
        got = jax.device_get(ba.solve_ba_packed(f32, i32, b8, K, M, O, E, P,
                                                iterations=4, cg_iters=0))
        np.testing.assert_allclose(np.asarray(got.poses),
                                   np.asarray(want.poses), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.points),
                                   np.asarray(want.points), atol=1e-6)

    def test_two_stage_packed_matches_unpacked(self):
        import jax
        import jax.numpy as jnp
        problem, _, _ = make_problem()
        K, M = problem.poses.shape[0], problem.points.shape[0]
        O, E, P = (problem.obs_kf.shape[0], problem.pe_a.shape[0],
                   problem.pr_idx.shape[0])
        stage2 = np.zeros(K, bool)
        anchor = np.zeros((6, 6), np.float32)
        anchor[:3, :3] = 50.0 * np.eye(3)
        want = jax.device_get(ba.solve_ba_two_stage(
            problem, jnp.asarray(stage2), jnp.asarray(1),
            jnp.asarray(anchor), iterations=3, cg_iters=0))
        f32, i32, b8 = ba.pack_problem(jax.tree.map(np.asarray, problem))
        f32 = np.concatenate([f32, anchor.ravel()])
        i32 = np.concatenate([i32, np.asarray([1], np.int32)])
        b8 = np.concatenate([b8, stage2])
        got = jax.device_get(ba.solve_ba_two_stage_packed(
            f32, i32, b8, K, M, O, E, P, iterations=3, cg_iters=0))
        np.testing.assert_allclose(np.asarray(got.poses),
                                   np.asarray(want.poses), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.points),
                                   np.asarray(want.points), atol=1e-6)
        # the single-buffer fused entry must reproduce the packed solve
        # bit-for-bit (bitcasts only, no value changes)
        fused = jax.device_get(ba.solve_ba_two_stage_fused(
            ba.fuse_packed(f32, i32, b8), K, M, O, E, P,
            iterations=3, cg_iters=0))
        np.testing.assert_array_equal(np.asarray(fused.poses),
                                      np.asarray(got.poses))
        np.testing.assert_array_equal(np.asarray(fused.points),
                                      np.asarray(got.points))

    def test_fused_matches_packed(self):
        import jax
        problem, _, _ = make_problem()
        K, M = problem.poses.shape[0], problem.points.shape[0]
        O, E, P = (problem.obs_kf.shape[0], problem.pe_a.shape[0],
                   problem.pr_idx.shape[0])
        f32, i32, b8 = ba.pack_problem(jax.tree.map(np.asarray, problem))
        want = jax.device_get(ba.solve_ba_packed(f32, i32, b8, K, M, O, E, P,
                                                 iterations=4, cg_iters=0))
        got = jax.device_get(ba.solve_ba_fused(
            ba.fuse_packed(f32, i32, b8), K, M, O, E, P,
            iterations=4, cg_iters=0))
        np.testing.assert_array_equal(np.asarray(got.poses),
                                      np.asarray(want.poses))
        np.testing.assert_array_equal(np.asarray(got.points),
                                      np.asarray(want.points))
        np.testing.assert_array_equal(np.asarray(got.obs_chi2),
                                      np.asarray(want.obs_chi2))
