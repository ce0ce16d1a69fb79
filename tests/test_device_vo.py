"""Device-resident batched VO backend: correctness on rendered frames.

The serving-path counterpart of the interactive pipeline: verifies the
whole scan-over-frames, vmap-over-sequences program tracks a known
trajectory from real rendered images with the map state living on device
(slam_tpu/pipeline/device_vo.py)."""
import numpy as np
import pytest

from synthetic_world import default_camera, make_world, visible_landmarks

from slam_tpu.geometry import se3
from slam_tpu.pipeline.device_vo import (BatchedDeviceVO, DeviceVOConfig,
                                         make_vo_step)


def _render_frames(world, n_frames, seed=0, patch=9, z_ref=4.0):
    """Perspective-correct landmark billboards: each landmark carries a
    fronto-parallel textured quad whose on-screen size scales with 1/depth,
    so detected texture corners correspond to (approximately) fixed 3D
    points — constant-size sprites would bias the VO geometry."""
    rng = np.random.default_rng(seed)
    n_land = len(world.landmarks)
    patches = rng.integers(40, 255, (n_land, patch, patch)).astype(np.uint8)
    w, h = world.camera.width, world.camera.height
    r = patch // 2
    frames = []
    lms_h = np.concatenate([world.landmarks, np.ones((n_land, 1))], axis=1)
    for i in range(n_frames):
        img = np.full((h, w), 20, np.uint8)
        z = (lms_h @ world.poses_cw[i].T)[:, 2]
        vis, pix = visible_landmarks(world, i, margin=float(r + 1))
        for li in vis:
            m = max(z_ref / max(z[li], 0.5), 0.25)
            half = max(1, int(round(r * m)))
            cx, cy = pix[li, 0], pix[li, 1]
            ys = np.arange(int(round(cy)) - half, int(round(cy)) + half + 1)
            xs = np.arange(int(round(cx)) - half, int(round(cx)) + half + 1)
            ys = ys[(ys >= 0) & (ys < h)]
            xs = xs[(xs >= 0) & (xs < w)]
            if len(ys) == 0 or len(xs) == 0:
                continue
            sy = np.clip(np.round((ys - cy) / m + r).astype(int), 0, patch - 1)
            sx = np.clip(np.round((xs - cx) / m + r).astype(int), 0, patch - 1)
            img[np.ix_(ys, xs)] = patches[li][np.ix_(sy, sx)]
        frames.append(img)
    return np.stack(frames)


class TestMeshShardedVO:
    def test_sharded_matches_unsharded(self):
        """S sequences sharded over an 8-device data mesh must produce the
        same poses as the single-device run (sequences are independent, so
        GSPMD partitions the vmapped scan with no cross-device math)."""
        import jax
        from slam_tpu.parallel.mesh import make_mesh

        cam = default_camera(160, 120)
        cfg = DeviceVOConfig(width=160, height=120, lm_capacity=32,
                             max_keypoints=60, ba_iterations=2,
                             window=0)   # pose-only scan variant
        S, T = 8, 3
        rng = np.random.default_rng(3)
        images = rng.integers(0, 256, (S, T, 120, 160)).astype(np.uint8)
        deltas = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (S, T, 4, 4)).copy()

        plain = BatchedDeviceVO(cfg, batch=S, camera=cam)
        out_plain = plain.advance(images, deltas)
        out_plain = jax.tree.map(np.asarray, out_plain)

        # see test_native_and_misc.TestMultichipStep: big GSPMD compiles on
        # top of a large executable cache have segfaulted the CPU compiler
        jax.clear_caches()
        from slam_tpu.pipeline import device_vo
        device_vo._CHUNK_CACHE.clear()
        mesh = make_mesh(8, axis_names=("data",))
        sharded = BatchedDeviceVO(cfg, batch=S, camera=cam, mesh=mesh)
        assert len(sharded.state.pose_cw.sharding.device_set) == 8
        out_sharded = sharded.advance(images, deltas)

        np.testing.assert_allclose(np.asarray(out_sharded.pose_cw),
                                   np.asarray(out_plain.pose_cw),
                                   rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(out_sharded.n_matched),
                              np.asarray(out_plain.n_matched))


@pytest.mark.slow
class TestFaultedOdometry:
    def test_jump_frame_cannot_corrupt_pose_beyond_fault(self):
        """A gross odometry jump throws the true landmarks outside the
        20 px projection gate; only a handful of wrong descriptor matches
        survive it. The `have_map >= 6` solve gate must reject that frame
        (a solve on the wrong matches was measured to amplify the 1 m
        fault to ~2.9 m), so the VO follows the faulted odometry — the
        reference's backendOnly behavior for a bad prior; recovering from
        faults is relocation/loop closure's job — and keeps mapping
        consistently in the shifted frame."""
        T = 14
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=600, seed=6,
                           trajectory="line", camera=cam)
        frames = _render_frames(world, T, seed=2)
        deltas = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [(world.poses_cw[i] @ np.linalg.inv(world.poses_cw[i - 1]))
               .astype(np.float32) for i in range(1, T)])
        deltas[7, 0, 3] += 1.0          # 1 m sideways jump at frame 7

        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=512,
                             max_keypoints=300, window=0)  # pose-only probe
        vo = BatchedDeviceVO(cfg, batch=1, camera=cam)
        p0 = world.poses_cw[0].astype(np.float32)[None]
        vo.state = vo.state._replace(pose_cw=p0, prev_pose_cw=p0)
        out = vo.advance(frames[None], deltas[None])
        poses = np.asarray(out.pose_cw)[0]
        n_matched = np.asarray(out.n_matched)[0]

        tail_err = np.mean([np.linalg.norm(
            se3.camera_center(poses[i]) - se3.camera_center(world.poses_cw[i]))
            for i in range(9, T)])
        # the error stays at the fault magnitude — never amplified
        assert tail_err < 1.15, tail_err
        # pre-jump tracking was tight
        pre_err = max(np.linalg.norm(
            se3.camera_center(poses[i]) - se3.camera_center(world.poses_cw[i]))
            for i in range(2, 7))
        assert pre_err < 0.05, pre_err
        # the VO keeps mapping in the shifted frame: matching re-engages
        assert n_matched[10:].min() >= 9, n_matched


@pytest.mark.slow
class TestMeshShardedWindowBA:
    def test_sharded_window_ba_matches_unsharded(self):
        """The sliding-window local-BA chunk must shard over the data mesh
        exactly like the pose-only chunk: per-sequence window state and the
        in-scan dense-Schur solves are batched, so GSPMD partitions them
        with no cross-device math and results match the single-device run."""
        import jax
        from slam_tpu.parallel.mesh import make_mesh
        from slam_tpu.pipeline import device_vo

        cam = default_camera(160, 120)
        cfg = DeviceVOConfig(width=160, height=120, lm_capacity=32,
                             max_keypoints=60, ba_iterations=2,
                             window=4, window_ba_every=2, window_ba_iters=2)
        S, T = 8, 4
        rng = np.random.default_rng(11)
        images = rng.integers(0, 256, (S, T, 120, 160)).astype(np.uint8)
        deltas = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (S, T, 4, 4)).copy()

        plain = BatchedDeviceVO(cfg, batch=S, camera=cam)
        out_plain = jax.tree.map(np.asarray, plain.advance(images, deltas))
        state_plain = jax.device_get(plain.state)

        jax.clear_caches()
        device_vo._CHUNK_CACHE.clear()
        mesh = make_mesh(8, axis_names=("data",))
        sharded = BatchedDeviceVO(cfg, batch=S, camera=cam, mesh=mesh)
        assert len(sharded.state.pose_cw.sharding.device_set) == 8
        out_sharded = sharded.advance(images, deltas)
        np.testing.assert_allclose(np.asarray(out_sharded.pose_cw),
                                   out_plain.pose_cw, rtol=1e-4, atol=1e-5)
        state_sharded = jax.device_get(sharded.state)
        np.testing.assert_allclose(np.asarray(state_sharded.win_pose_cw),
                                   np.asarray(state_plain.win_pose_cw),
                                   rtol=1e-4, atol=1e-5)


class TestCompiledProgramCache:
    def test_instances_share_compiled_program(self):
        """A fresh session must reuse the cached jitted chunk program —
        remote compiles cost ~30 s, so a per-instance closure is a compile
        leak (CLAUDE.md rule)."""
        cam = default_camera(320, 240)
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=64,
                             max_keypoints=100, window=0)
        a = BatchedDeviceVO(cfg, batch=2, camera=cam)
        b = BatchedDeviceVO(cfg, batch=2, camera=cam)
        assert a._chunk is b._chunk
        # a different static config must NOT share a program
        c = BatchedDeviceVO(cfg._replace(match_radius_px=10.0), batch=2,
                            camera=cam)
        assert c._chunk is not a._chunk

    def test_save_load_state_roundtrip(self, tmp_path):
        """Checkpoint/resume of a device-resident session: a resumed session
        must continue EXACTLY like the original (bit-equal poses)."""
        cam = default_camera(320, 240)
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=64,
                             max_keypoints=100, window=0)
        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 256, (2, 2, 240, 320)).astype(np.uint8)
        deltas = np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (2, 2, 4, 4)).copy()

        vo = BatchedDeviceVO(cfg, batch=2, camera=cam)
        vo.advance(imgs, deltas)
        path = str(tmp_path / "vo_state.npz")
        vo.save_state(path)
        cont = np.asarray(vo.advance(imgs, deltas).pose_cw)

        vo2 = BatchedDeviceVO(cfg, batch=2, camera=cam)
        vo2.load_state(path)
        resumed = np.asarray(vo2.advance(imgs, deltas).pose_cw)
        np.testing.assert_array_equal(resumed, cont)

        # capacity mismatch must be rejected, not silently truncated
        vo3 = BatchedDeviceVO(cfg._replace(lm_capacity=32), batch=2,
                              camera=cam)
        with pytest.raises(AssertionError):
            vo3.load_state(path)

    def test_reset_restores_initial_state(self):
        cam = default_camera(320, 240)
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=64,
                             max_keypoints=100, window=0)
        vo = BatchedDeviceVO(cfg, batch=2, camera=cam)
        p0 = np.stack([np.eye(4, dtype=np.float32)] * 2)
        p0[:, 0, 3] = [1.0, 2.0]
        vo.reset(poses0_cw=p0)
        assert np.allclose(np.asarray(vo.state.pose_cw), p0)
        assert np.allclose(np.asarray(vo.state.prev_pose_cw), p0)
        assert not np.asarray(vo.state.lm_valid).any()
        assert int(np.asarray(vo.state.frame_idx).max()) == 0


@pytest.mark.slow
class TestBatchedDeviceVO:
    def test_tracks_rendered_trajectory(self):
        T = 12
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=500, seed=2,
                           trajectory="line", camera=cam)
        frames = _render_frames(world, T)

        # odometry deltas from the (noise-free) ground truth: the VO step
        # must keep the pose consistent while building a device-side map
        deltas = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [(world.poses_cw[i] @ np.linalg.inv(world.poses_cw[i - 1]))
               .astype(np.float32) for i in range(1, T)])

        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=512,
                             max_keypoints=300)
        vo = BatchedDeviceVO(cfg, batch=2, camera=cam)
        images = np.stack([frames, frames])          # two identical sequences
        odo = np.stack([deltas, deltas])
        vo.state = vo.state._replace(pose_cw=np.stack(
            [world.poses_cw[0].astype(np.float32)] * 2),
            prev_pose_cw=np.stack([world.poses_cw[0].astype(np.float32)] * 2))
        out = vo.advance(images, odo)

        poses = np.asarray(out.pose_cw)              # (2, T, 4, 4)
        assert np.isfinite(poses).all()
        n_matched = np.asarray(out.n_matched)
        n_new = np.asarray(out.n_new)
        # the map fills up and matching engages after the first frames
        assert n_new[:, 1].min() >= 20, n_new[:, :3]
        assert n_matched[:, 3:].min() >= 20, n_matched
        # both sequences are identical => identical results
        assert np.allclose(poses[0], poses[1])
        # pose error stays near ground truth (odometry prior is exact here;
        # the test fails if the matching/BA stages corrupt the pose)
        errs = [np.linalg.norm(se3.camera_center(poses[0, i])
                               - se3.camera_center(world.poses_cw[i]))
                for i in range(T)]
        assert max(errs) < 0.05, errs

    def test_pose_ba_corrects_drifting_odometry(self):
        """With systematically drifting odometry deltas, matching against
        the device-side map must keep the pose closer to the ground truth
        than the raw odometry chain."""
        T = 20
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=600, seed=4,
                           trajectory="line", camera=cam)
        frames = _render_frames(world, T, seed=1)
        deltas, noisy_chain = _drifting_deltas(world, T)

        # mechanism probe at the LIGHT odometry anchor (the pre-round-4
        # 100/1000 weights): with the prior barely trusted, the map matching
        # alone must carry the correction. The measured production DEFAULT
        # (1000/10000 + window BA) intentionally tracks its prior harder —
        # its never-worse-than-odometry safety is asserted by the
        # sweep_device_vo matrix (RESULTS.md), not this bound.
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=512,
                             max_keypoints=300, window=0,
                             odom_pos_weight=100.0, odom_rot_weight=1000.0)
        vo = BatchedDeviceVO(cfg, batch=1, camera=cam)
        vo.state = vo.state._replace(
            pose_cw=world.poses_cw[0].astype(np.float32)[None],
            prev_pose_cw=world.poses_cw[0].astype(np.float32)[None])
        out = vo.advance(frames[None], deltas[None])
        poses = np.asarray(out.pose_cw)[0]

        vo_err = _mean_center_err(poses, world)
        odo_err = _mean_center_err(np.stack(noisy_chain), world)
        assert np.isfinite(poses).all()
        assert vo_err < odo_err, (vo_err, odo_err)
        # the injected drift reaches ~2cm/frame by the end of the sequence;
        # VO must hold the mean error well under the odometry chain's
        assert vo_err < 0.15, vo_err

        # the production default must never be significantly WORSE than its
        # own odometry input, even in this extreme-drift regime
        vo_d = BatchedDeviceVO(
            DeviceVOConfig(width=320, height=240, lm_capacity=512,
                           max_keypoints=300), batch=1, camera=cam)
        vo_d.state = vo_d.state._replace(
            pose_cw=world.poses_cw[0].astype(np.float32)[None],
            prev_pose_cw=world.poses_cw[0].astype(np.float32)[None])
        out_d = vo_d.advance(frames[None], deltas[None])
        vo_err_d = _mean_center_err(np.asarray(out_d.pose_cw)[0], world)
        assert vo_err_d < odo_err, (vo_err_d, odo_err)


def _drifting_deltas(world, T, seed=5):
    """Odometry delta chain with a random-walk translation drift (and the
    resulting integrated noisy pose chain, for the comparison baseline)."""
    rng = np.random.default_rng(seed)
    deltas = [np.eye(4, dtype=np.float32)]
    noisy_chain = [world.poses_cw[0].astype(np.float32)]
    drift = np.zeros(3)
    for i in range(1, T):
        true_delta = (world.poses_cw[i]
                      @ np.linalg.inv(world.poses_cw[i - 1]))
        drift = drift + rng.normal(0, 4e-3, 3)
        xi = np.concatenate([rng.normal(0, 5e-4, 3),
                             rng.normal(0, 1e-3, 3) + drift])
        nd = (se3.se3_exp(xi) @ true_delta).astype(np.float32)
        deltas.append(nd)
        noisy_chain.append((nd @ noisy_chain[-1]).astype(np.float32))
    return np.stack(deltas), noisy_chain


def _mean_center_err(poses, world, skip=4):
    return np.mean([np.linalg.norm(
        se3.camera_center(poses[i]) - se3.camera_center(world.poses_cw[i]))
        for i in range(skip, len(poses))])


@pytest.mark.slow
class TestWindowBA:
    def test_window_ba_beats_pose_only_on_drift(self):
        """The device-resident sliding-window local BA (joint pose +
        landmark LM inside the scanned program) must track the drifting
        sequence more accurately than the pose-only VO core, and its window
        state must stay consistent across the ring wrap-around."""
        T = 20
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=600, seed=4,
                           trajectory="line", camera=cam)
        frames = _render_frames(world, T, seed=1)
        deltas, _ = _drifting_deltas(world, T)
        # mechanism probe at the LIGHT odometry anchor (pre-round-4
        # weights): the window solver's correction must be visible over the
        # pose-only core. The production 1000/10000 default tracks its
        # prior much harder in this extreme-drift regime by design; its
        # accuracy contract is the sweep_device_vo matrix (RESULTS.md).
        base = DeviceVOConfig(width=320, height=240, lm_capacity=512,
                              max_keypoints=300, window=0,
                              odom_pos_weight=100.0, odom_rot_weight=1000.0)
        p0 = world.poses_cw[0].astype(np.float32)[None]

        def run(cfg):
            vo = BatchedDeviceVO(cfg, batch=1, camera=cam)
            vo.state = vo.state._replace(pose_cw=p0, prev_pose_cw=p0)
            out = vo.advance(frames[None], deltas[None])
            return np.asarray(out.pose_cw)[0], vo.state

        poses_po, _ = run(base)
        poses_wb, state = run(base._replace(window=8, window_ba_every=4,
                                            window_ba_iters=3))

        assert np.isfinite(poses_wb).all()
        err_po = _mean_center_err(poses_po, world)
        err_wb = _mean_center_err(poses_wb, world)
        # measured: 0.072 (window BA) vs 0.119 (pose-only); margin for noise
        assert err_wb < err_po, (err_wb, err_po)
        assert err_wb < 0.10, err_wb

        # window-state invariants after T=20 frames through a K=8 ring:
        # every slot occupied, poses finite, and the observation store only
        # carries entries for live landmarks with finite measurements
        win_valid = np.asarray(state.win_valid)[0]
        assert win_valid.all(), win_valid
        assert np.isfinite(np.asarray(state.win_pose_cw)).all()
        wobs_valid = np.asarray(state.wobs_valid)[0]
        wobs_meas = np.asarray(state.wobs_meas)[0]
        assert wobs_valid.sum() > 0
        assert np.isfinite(wobs_meas[wobs_valid]).all()


class TestDeviceLoopDetection:
    def test_signature_ring_flags_the_revisit(self):
        """Device-resident loop-candidate retrieval (cfg.loop_every > 0):
        on a square-loop trajectory whose second lap revisits the first
        lap's poses exactly, the in-scan signature ring must (a) stay
        silent during the first lap (no candidate above the score gate
        once the time gate excludes the recent past), and (b) flag the
        matching first-lap frame during the revisit with a clearly higher
        score than any first-lap false candidate."""
        lap, T = 32, 48
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=700, seed=6,
                           trajectory="loop", lap_frames=lap, camera=cam)
        frames = _render_frames(world, T, seed=2)
        deltas = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [(world.poses_cw[i] @ np.linalg.inv(world.poses_cw[i - 1]))
               .astype(np.float32) for i in range(1, T)])

        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=256,
                             max_keypoints=200, ba_iterations=2,
                             loop_every=2, loop_slots=32, loop_words=256,
                             loop_min_gap=16, loop_min_score=0.92)
        vo = BatchedDeviceVO(cfg, batch=1, camera=cam)
        p0 = world.poses_cw[0].astype(np.float32)[None]
        vo.state = vo.state._replace(pose_cw=p0, prev_pose_cw=p0)
        out = vo.advance(frames[None], deltas[None])

        loop_frame = np.asarray(out.loop_frame)[0]       # (T,)
        loop_score = np.asarray(out.loop_score)[0]
        assert np.isfinite(loop_score).all()

        # the first lap must stay silent: early frames have no eligible
        # candidate at all, and mid-lap cross-wall similarity (the random
        # dot texture is deliberately self-similar; measured max ~0.88)
        # stays under the score gate
        assert (loop_frame[:lap] == -1).all(), loop_frame[:lap]
        assert loop_score[cfg.loop_min_gap:lap].max() < cfg.loop_min_score

        # revisit frames aligned with the storage cadence see the identical
        # first-lap rendering: score ~1 and the flagged frame must be the
        # same-lap-position first-lap frame
        aligned = [i for i in range(lap + 2, T) if (i - lap) % 2 == 0]
        assert np.all(loop_score[aligned] > 0.99), loop_score[aligned]
        for i in aligned:
            cand = int(loop_frame[i])
            assert cand >= 0
            assert abs(cand - (i - lap)) <= cfg.loop_every, (i, cand)

        # the host-side consumption helper reports exactly the flagged rows
        from slam_tpu.pipeline.device_vo import loop_candidates
        rows = loop_candidates(out, frame_offset=100)
        assert len(rows) == int((loop_frame >= 0).sum())
        assert set(rows[:, 1].astype(int)) == {
            100 + i for i in range(T) if loop_frame[i] >= 0}
        assert (rows[:, 2] >= 0).all() and (rows[:, 3] >= 0.92).all()

        # detection off (default cfg): outputs are the documented sentinels
        vo_off = BatchedDeviceVO(
            DeviceVOConfig(width=320, height=240, lm_capacity=256,
                           max_keypoints=200, ba_iterations=2),
            batch=1, camera=cam)
        vo_off.state = vo_off.state._replace(pose_cw=p0, prev_pose_cw=p0)
        out_off = vo_off.advance(frames[None, :8], deltas[None, :8])
        assert (np.asarray(out_off.loop_frame) == -1).all()
        assert (np.asarray(out_off.loop_score) == 0.0).all()


@pytest.mark.slow
class TestDeviceLoopClosure:
    """End-to-end loop CLOSURE on the device path: the host consumer
    (pipeline/device_slam.py) geometrically verifies the in-scan retrieval
    flags, runs Sim3 RANSAC + refinement + the reference's drift gates at
    their DEFAULT values, corrects the trajectory and rebases the
    device-resident state."""

    def _setup(self, lap=32, T=64, drift_per_frame=5e-3):
        cam = default_camera(320, 240)
        world = make_world(n_frames=T, n_landmarks=700, seed=6,
                           trajectory="loop", lap_frames=lap, camera=cam)
        frames = _render_frames(world, T, seed=2)
        # constant VERTICAL odometry bias: on this yaw-only planar loop,
        # camera y stays world-vertical, so the bias accumulates linearly
        # (~0.1 m by the closure frame) instead of canceling around the
        # square the way in-plane biases do — and it sits inside the
        # DEFAULT drift-rate acceptance gates (0.096/3.2 s = 0.03 <= 0.05
        # m/s; 0.096/4.8 m traveled = 0.02 <= 0.05 m/m)
        bias = np.eye(4, dtype=np.float32)
        bias[1, 3] = drift_per_frame
        deltas = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [bias @ (world.poses_cw[i] @ np.linalg.inv(world.poses_cw[i - 1]))
               .astype(np.float32) for i in range(1, T)])
        # loop_min_score stays at its 0.0 DEFAULT (device reports every
        # eligible candidate): the host's auto-calibrated score gate is
        # what must keep the consumer from firing on cross-scene similarity
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=256,
                             max_keypoints=200, ba_iterations=2,
                             loop_every=2, loop_slots=32, loop_words=256,
                             loop_min_gap=16, loop_points=128)
        return cam, world, frames, deltas, cfg

    def _run(self, cam, world, frames, deltas, cfg, apply_closures):
        from slam_tpu.pipeline.device_slam import DeviceSlam, DeviceSlamParams

        T = frames.shape[0]
        chunk = 8
        # calib_frames=24: the first lap's pre-revisit segment is the
        # revisit-free bootstrap the auto-calibrated score gate needs
        params = DeviceSlamParams(frame_dt=0.1, apply_closures=apply_closures,
                                  calib_frames=24)
        slam = DeviceSlam(cfg, batch=1, camera=cam, params=params)
        p0 = world.poses_cw[0].astype(np.float32)[None]
        slam.vo.state = slam.vo.state._replace(pose_cw=p0, prev_pose_cw=p0)
        for c in range(T // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            slam.advance(frames[None, sl], deltas[None, sl])
        slam.finish()
        return slam

    def test_closure_corrects_drifted_trajectory(self):
        import jax

        cam, world, frames, deltas, cfg = self._setup()
        lap = 32

        control = self._run(cam, world, frames, deltas, cfg,
                            apply_closures=False)
        slam = self._run(cam, world, frames, deltas, cfg,
                         apply_closures=True)

        # geometric verification accepted a flagged revisit (and the pair is
        # a genuine one-lap-apart revisit)
        accepted = [e for e in slam.closures if e.accepted]
        assert accepted, [e.reason for e in slam.closures]
        ev = accepted[0]
        assert abs((ev.query_frame - ev.cand_frame) - lap) <= cfg.loop_every
        assert ev.n_inliers >= 20

        # the auto-calibrated score gate sits above the bootstrap's
        # cross-scene similarity (measured max ~0.88 on this texture) and
        # below the genuine-revisit scores (~1.0); a rare pre-revisit false
        # candidate may still reach geometric verification (the gate is a
        # prefilter) but must be REJECTED there — never accepted
        gate = slam._score_gate[0]
        assert gate is not None and 0.80 < gate < 0.99, gate
        assert all(e.query_frame >= lap for e in accepted)

        # the gates ran at their DEFAULT values (regression guard: a closure
        # accepted only because gates were loosened is not this test)
        from slam_tpu.pipeline.device_slam import DeviceSlamParams
        dflt = DeviceSlamParams()
        assert slam.params.max_drift_m_per_s == dflt.max_drift_m_per_s
        assert slam.params.max_drift_rad_per_s == dflt.max_drift_rad_per_s

        # trajectory error over the corrected tail drops vs the no-closure
        # control run
        def tail_err(s):
            traj = s.trajectory(0)
            q = ev.query_frame
            return float(np.mean([
                np.linalg.norm(se3.camera_center(traj[i])
                               - se3.camera_center(world.poses_cw[i]))
                for i in range(q, len(traj))]))

        e_ctrl, e_closed = tail_err(control), tail_err(slam)
        assert e_closed < 0.7 * e_ctrl, (e_closed, e_ctrl)

        # the DEVICE STATE was rebased, not just the host log: the live
        # state must equal the no-closure control's state right-multiplied
        # by the accepted correction. (The online pose log trails the
        # in-state window-BA refinement by design — outputs are emitted
        # per frame, the trailing window solve then refines the state — so
        # state/log equality only holds for window=0; the control relation
        # is exact for both.)
        pose_state = np.asarray(jax.device_get(slam.vo.state.pose_cw))[0]
        pose_ctrl = np.asarray(jax.device_get(control.vo.state.pose_cw))[0]
        np.testing.assert_allclose(pose_state, pose_ctrl @ ev.T,
                                   rtol=1e-4, atol=1e-4)
        # and the log tail agrees with the state up to that refinement
        assert np.abs(pose_state - slam.trajectory(0)[-1]).max() < 0.05

        # control run: flags were still produced and verified (events
        # recorded) but nothing moved
        assert any(e.accepted for e in control.closures)
        ctrl_traj = control.trajectory(0)
        vo_plain = BatchedDeviceVO(cfg, batch=1, camera=cam)
        p0 = world.poses_cw[0].astype(np.float32)[None]
        vo_plain.state = vo_plain.state._replace(pose_cw=p0, prev_pose_cw=p0)
        out_plain = vo_plain.advance(frames[None], deltas[None])
        np.testing.assert_allclose(ctrl_traj,
                                   np.asarray(out_plain.pose_cw)[0],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
class TestDeviceMultiClosure:
    """Verdict-r4 hardening of the device closure path beyond one closure:
    >= 2 accepted closures over 3 laps (exercises `_correct_log`'s start
    bound and post-rebase retrieval), with the in-scan window BA active
    (the rebase moves `win_pose_cw` precisely for this), plus the
    post-closure duplicate-landmark merge on a frozen map."""

    def _world(self, lap=32, laps=3, drift_per_frame=5e-3, width=320,
               height=240):
        T = lap * laps
        cam = default_camera(width, height)
        world = make_world(n_frames=T, n_landmarks=700, seed=6,
                           trajectory="loop", lap_frames=lap, camera=cam)
        frames = _render_frames(world, T, seed=2)
        bias = np.eye(4, dtype=np.float32)
        bias[1, 3] = drift_per_frame
        deltas = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [bias @ (world.poses_cw[i] @ np.linalg.inv(world.poses_cw[i - 1]))
               .astype(np.float32) for i in range(1, T)])
        return cam, world, frames, deltas

    def _drive(self, cam, world, frames, deltas, cfg, params):
        from slam_tpu.pipeline.device_slam import DeviceSlam

        T = frames.shape[0]
        chunk = 8
        slam = DeviceSlam(cfg, batch=1, camera=cam, params=params)
        p0 = world.poses_cw[0].astype(np.float32)[None]
        slam.vo.state = slam.vo.state._replace(pose_cw=p0, prev_pose_cw=p0)
        for c in range(T // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            slam.advance(frames[None, sl], deltas[None, sl])
        slam.finish()
        return slam

    def test_two_closures_with_window_ba(self):
        import jax
        from slam_tpu.pipeline.device_slam import DeviceSlamParams

        lap = 32
        cam, world, frames, deltas = self._world(lap=lap, laps=3)
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=256,
                             max_keypoints=200, ba_iterations=2,
                             window=8, window_ba_every=4,
                             loop_every=2, loop_slots=32, loop_words=256,
                             loop_min_gap=16, loop_points=128)
        # min_closure_gap 2 s at 10 fps = 20 frames: both revisit laps can
        # close; the drift gates stay at their defaults
        params = DeviceSlamParams(frame_dt=0.1, calib_frames=24,
                                  min_closure_gap_s=2.0)
        slam = self._drive(cam, world, frames, deltas, cfg, params)
        control = self._drive(cam, world, frames, deltas, cfg,
                              params._replace(apply_closures=False))

        accepted = [e for e in slam.closures if e.accepted]
        assert len(accepted) >= 2, [(e.reason, e.query_frame)
                                    for e in slam.closures]
        # the second closure fires AFTER the first's rebase (post-rebase
        # retrieval works) and respects the closure gap
        qs = [e.query_frame for e in accepted]
        assert qs[1] - qs[0] >= 20
        # closure lag is the documented one-chunk consumer lag
        assert slam.closure_lags and all(0 < l <= 24 for l in slam.closure_lags)

        def tail_err(s, f0):
            traj = s.trajectory(0)
            return float(np.mean([
                np.linalg.norm(se3.camera_center(traj[i])
                               - se3.camera_center(world.poses_cw[i]))
                for i in range(f0, len(traj))]))

        # final-lap error improves markedly over the no-closure control
        e_ctrl = tail_err(control, 2 * lap)
        e_closed = tail_err(slam, 2 * lap)
        assert e_closed < 0.7 * e_ctrl, (e_closed, e_ctrl)
        # the device state was rebased by both closures: it tracks the
        # corrected log tail (up to the in-state window-BA refinement the
        # online log trails by design) and sits far from the uncorrected
        # control state
        pose_state = np.asarray(jax.device_get(slam.vo.state.pose_cw))[0]
        assert np.abs(pose_state - slam.trajectory(0)[-1]).max() < 0.05
        pose_ctrl = np.asarray(jax.device_get(control.vo.state.pose_cw))[0]
        assert np.linalg.norm(se3.camera_center(pose_state)
                              - se3.camera_center(pose_ctrl)) > 0.08
        assert np.isfinite(
            np.asarray(jax.device_get(slam.vo.state.win_pose_cw))).all()

    def test_merge_collapses_frozen_map_duplicates(self):
        """Frozen-map config (stale_age >= episode): lap-1 landmarks survive
        to the revisit, a gross odometry fault at the lap boundary shifts
        the whole second lap (the VO follows a faulted prior and keeps
        mapping in the shifted frame — TestFaultedOdometry), so lap 2 mints
        displaced duplicate landmarks. The closure must recover the shift
        and the post-closure merge must collapse the duplicates — and
        re-traversing the closed region must not re-mint them (verdict r4
        item 2). Drift-rate gates are loosened (a 0.5 m step is far outside
        the continuous-drift envelope they model); gate calibration at
        defaults is covered by TestDeviceLoopClosure."""
        import jax
        from slam_tpu.ops.hamming import hamming_matrix_host
        from slam_tpu.pipeline.device_slam import DeviceSlamParams

        lap = 32
        cam, world, frames, deltas = self._world(lap=lap, laps=3,
                                                 drift_per_frame=0.0)
        # single-frame 0.5 m vertical odometry fault at the lap boundary:
        # throws the true landmarks outside the 20 px projection gate, so
        # the whole second lap maps in the shifted frame
        fault = np.eye(4, dtype=np.float32)
        fault[1, 3] = 0.5
        deltas[lap] = fault @ deltas[lap]
        # lm_capacity must hold BOTH the frozen lap-1 map and the lap-2
        # duplicates — an exhausted store would silently suppress the
        # duplicate minting this test is about
        cfg = DeviceVOConfig(width=320, height=240, lm_capacity=2048,
                             max_keypoints=200, ba_iterations=2, window=0,
                             stale_age=10 ** 6, max_depth_step=0.0,
                             loop_every=2, loop_slots=32, loop_words=256,
                             loop_min_gap=16, loop_points=128)
        params = DeviceSlamParams(frame_dt=0.1, calib_frames=24,
                                  min_closure_gap_s=2.0,
                                  max_drift_m_per_s=10.0,
                                  max_drift_m_per_m=10.0,
                                  max_drift_rad_per_s=1.0,
                                  max_drift_rad_per_m=1.0,
                                  merge_radius_m=0.3)

        def dup_count(slam):
            st = jax.device_get(slam.vo.state)
            valid = np.asarray(st.lm_valid)[0]
            pos = np.asarray(st.lm_pos)[0][valid]
            desc = np.asarray(st.lm_desc)[0][valid]
            ham = hamming_matrix_host(desc, desc)
            d3 = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            pair = (ham <= 50) & (d3 <= 0.3)
            return int(np.triu(pair, k=1).sum())

        slam = self._drive(cam, world, frames, deltas, cfg, params)
        no_merge = self._drive(cam, world, frames, deltas, cfg,
                               params._replace(merge_landmarks=False))

        assert any(e.accepted for e in slam.closures), \
            [e.reason for e in slam.closures]
        assert any(e.accepted for e in no_merge.closures)
        d_merge, d_plain = dup_count(slam), dup_count(no_merge)
        assert d_merge < 0.5 * d_plain, (d_merge, d_plain)

        # re-traversal does not re-mint: after the first closure the merged
        # map re-matches, so lap-3 mints far fewer landmarks than lap 2
        q0 = min(e.query_frame for e in slam.closures if e.accepted)
        # (n_new is only in the chunk outputs; recover from the state's
        # creation log instead: landmarks created on each lap)
        created = np.asarray(jax.device_get(slam.vo.state.lm_created))[0]
        valid = np.asarray(jax.device_get(slam.vo.state.lm_valid))[0]
        lap2 = int(((created >= lap) & (created < 2 * lap) & valid).sum())
        lap3 = int(((created >= 2 * lap) & valid).sum())
        assert lap3 < 0.7 * max(lap2, 1) + 5, (lap2, lap3, q0)
