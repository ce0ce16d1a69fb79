"""End-to-end backend pipeline tests on the synthetic world."""
import os

import numpy as np
import pytest

from slam_tpu.geometry import se3
from slam_tpu.ids import MpId
from slam_tpu.map.map_point import MapPointStatus
from slam_tpu.params import Parameters, ParametersSlam
from slam_tpu.pipeline.mapper import Mapper
from slam_tpu.pipeline.mapper_helpers import check_consistency

from synthetic_world import (FakeOrbExtractor, TrackSimulator, make_mapper_input,
                             make_world)


def default_params(**overrides):
    base = dict(
        keyframeDecisionMinIntervalSeconds=0.0,
        keyframeDecisionCovisibilityRatio=0.95,
        minVisibleMapPointsInCurrentFrameBA=8,
        localBAProblemSize=12,
        adjacentSpaceSize=10,
        useFrontendSlam=False)
    base.update(overrides)
    return Parameters(slam=ParametersSlam(**base))


def run_sequence(world, params, n_frames=None, with_depth=False):
    tracker = TrackSimulator(world)
    extractor = FakeOrbExtractor(world, tracker)
    mapper = Mapper(params, orb_extractor=extractor)
    poses = []
    for i in range(n_frames or len(world.poses_cw)):
        mi = make_mapper_input(world, i, tracker, with_depth=with_depth)
        pose, cloud = mapper.advance(mi)
        poses.append(pose)
    return mapper, poses, tracker


class TestBackendOnlyVO:
    def test_straight_line_recovers_trajectory(self):
        world = make_world(n_frames=30, n_landmarks=300, odom_noise=0.0)
        params = default_params()
        mapper, poses, _ = run_sequence(world, params)
        check_consistency(mapper.map_db)
        assert len(mapper.map_db.keyframes) >= 5
        # with perfect odometry the SLAM poses must match the ground truth
        errs = []
        for i, pose in enumerate(poses):
            errs.append(np.linalg.norm(se3.camera_center(pose)
                                       - se3.camera_center(world.poses_cw[i])))
        assert np.median(errs) < 0.05, np.median(errs)

    def test_map_points_triangulated_near_truth(self):
        world = make_world(n_frames=30, n_landmarks=300)
        params = default_params()
        mapper, _, tracker = run_sequence(world, params)
        db = mapper.map_db
        tri = [mp for mp in db.map_points.values()
               if mp.status == MapPointStatus.TRIANGULATED]
        assert len(tri) > 50, len(tri)
        errs = []
        for mp in tri:
            if mp.track_id >= 0:
                lm = tracker.track_to_landmark[int(mp.track_id)]
                errs.append(np.linalg.norm(mp.position - world.landmarks[lm]))
        assert len(errs) > 20
        assert np.median(errs) < 0.1, np.median(errs)

    def test_consistency_after_noisy_run(self):
        world = make_world(n_frames=40, n_landmarks=250, odom_noise=0.002)
        tracker = TrackSimulator(world)
        extractor = FakeOrbExtractor(world, tracker, pix_noise=0.3)
        mapper = Mapper(default_params(), orb_extractor=extractor)
        for i in range(40):
            mapper.advance(make_mapper_input(world, i, tracker))
        check_consistency(mapper.map_db)
        assert mapper.end("")

    def test_keyframe_decision_interval(self):
        world = make_world(n_frames=20)
        params = default_params(keyframeDecisionMinIntervalSeconds=0.5,
                                keyframeDecisionDistanceThreshold=100.0)
        mapper, _, tracker = run_sequence(world, params)
        # 20 frames at 10 fps with 0.5 s min interval -> ~4-5 keyframes
        # (non-keyframes are processed then discarded)
        assert len(mapper.map_db.keyframes) <= 6

    def test_depth_seeded_triangulation(self):
        world = make_world(n_frames=15, n_landmarks=200)
        mapper, _, tracker = run_sequence(world, default_params(), with_depth=True)
        tri = [mp for mp in mapper.map_db.map_points.values()
               if mp.status != MapPointStatus.NOT_TRIANGULATED and mp.track_id >= 0]
        assert len(tri) > 30

    def test_ba_stats_accumulate(self):
        world = make_world(n_frames=12)
        mapper, _, tracker = run_sequence(world, default_params())
        totals = mapper.workspace_ba.ba_stats.totals
        assert sum(totals.values()) > 0


class TestSerializationRoundTrip:
    def test_save_load(self, tmp_path):
        from slam_tpu.map.serialization import load_map_db, save_map_db
        world = make_world(n_frames=20, n_landmarks=200)
        mapper, _, tracker = run_sequence(world, default_params())
        path = str(tmp_path / "map.npz")
        save_map_db(mapper.map_db, path)
        db2 = load_map_db(None, None, path)
        assert set(db2.keyframes) == set(mapper.map_db.keyframes)
        assert set(db2.map_points) == set(mapper.map_db.map_points)
        for kf_id, kf in mapper.map_db.keyframes.items():
            kf2 = db2.keyframes[kf_id]
            assert np.allclose(kf2.pose_cw, kf.pose_cw)
            assert np.array_equal(kf2.shared.descriptors, kf.shared.descriptors)
            assert np.array_equal(kf2.map_points, kf.map_points)
            assert kf2.shared.feature_search is not None
        for mp_id, mp in mapper.map_db.map_points.items():
            mp2 = db2.map_points[mp_id]
            assert np.allclose(mp2.position, mp.position)
            assert mp2.observations == mp.observations
            assert mp2.status == mp.status
        check_consistency(db2)

    def test_trajectory_csv(self, tmp_path):
        from slam_tpu.map.serialization import save_trajectory_csv
        world = make_world(n_frames=12)
        mapper, _, tracker = run_sequence(world, default_params())
        path = str(tmp_path / "traj.csv")
        save_trajectory_csv(mapper.map_db, path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == len(mapper.map_db.keyframes)
        row = [float(v) for v in lines[0].split(",")]
        assert len(row) == 8  # t, xyz, quat


class TestFrontendBackendThreaded:
    def test_dual_map_mode_runs(self):
        world = make_world(n_frames=24, n_landmarks=250)
        tracker = TrackSimulator(world)
        extractor = FakeOrbExtractor(world, tracker)
        params = default_params(useFrontendSlam=True,
                                backendProcessDelay=2,
                                copySlamMapEveryNSlamFrames=4,
                                deterministicSlamMapCopy=True)
        mapper = Mapper(params, orb_extractor=extractor)
        poses = []
        for i in range(24):
            pose, _ = mapper.advance(make_mapper_input(world, i, tracker))
            poses.append(pose)
        assert mapper.end("")
        check_consistency(mapper.map_db)
        errs = [np.linalg.norm(se3.camera_center(p)
                               - se3.camera_center(world.poses_cw[i]))
                for i, p in enumerate(poses)]
        assert np.median(errs) < 0.1


class TestBatchedTriangulation:
    def test_batch_matches_scalar(self):
        """triangulate_map_points (batched) must reproduce the scalar
        triangulate_map_point on every live map point of a real episode."""
        from slam_tpu.pipeline import mapper_helpers as mh
        from slam_tpu.params import StaticSettings

        world = make_world(n_frames=24, n_landmarks=250, odom_noise=0.002)
        mapper, _, _ = run_sequence(world, default_params())
        settings = mapper.settings

        mdb_a = mapper.map_db.copy()
        mdb_b = mapper.map_db.copy()
        for mp in list(mdb_a.map_points.values()):
            mh.triangulate_map_point(mdb_a, mp, settings)
        mh.triangulate_map_points(mdb_b, list(mdb_b.map_points.values()),
                                  settings)

        assert set(mdb_a.map_points) == set(mdb_b.map_points)
        n_checked = 0
        for mp_id, a in mdb_a.map_points.items():
            b = mdb_b.map_points[mp_id]
            assert a.status == b.status, mp_id
            np.testing.assert_allclose(a.position, b.position,
                                       rtol=1e-7, atol=1e-9)
            n_checked += 1
        assert n_checked > 50


class TestMatchTrackedLockstep:
    @pytest.mark.parametrize("with_depth", [False, True])
    def test_batched_matches_scalar(self, with_depth, monkeypatch):
        """The batched match_tracked_features must reproduce the scalar
        per-keypoint walk (its semantics reference) at EVERY pipeline call:
        same observation wiring, statuses, positions, descriptors, cones,
        and map-point id allocation."""
        from slam_tpu.pipeline import mapper_helpers as mh

        real = mh.match_tracked_features
        calls = {"n": 0, "pend": 0, "tri": 0, "fresh": 0}

        def lockstep(kf, map_db, settings):
            db2 = map_db.copy()
            same = kf is map_db.keyframes.get(kf.id)
            kf2 = db2.keyframes[kf.id] if same else kf.copy()
            mh._match_tracked_features_scalar(kf2, db2, settings)
            real(kf, map_db, settings)
            calls["n"] += 1
            assert np.array_equal(kf.map_points, kf2.map_points)
            assert set(map_db.map_points) == set(db2.map_points)
            assert map_db.track_id_to_map_point == db2.track_id_to_map_point
            assert map_db._next_mp == db2._next_mp
            for mp_id, a in map_db.map_points.items():
                b = db2.map_points[mp_id]
                assert a.status == b.status, mp_id
                assert a.observations == b.observations, mp_id
                assert a.track_id == b.track_id, mp_id
                np.testing.assert_allclose(a.position, b.position,
                                           rtol=1e-7, atol=1e-9)
                assert np.array_equal(a.descriptor, b.descriptor), mp_id
                np.testing.assert_allclose(a.norm, b.norm,
                                           rtol=1e-4, atol=1e-6)
                np.testing.assert_allclose(
                    [a.min_viewing_distance, a.max_viewing_distance],
                    [b.min_viewing_distance, b.max_viewing_distance],
                    rtol=1e-7, atol=1e-12)
            # track path coverage so the test can't silently go vacuous
            st = [map_db.map_points[m].status
                  for m in map_db.track_id_to_map_point.values()]
            calls["tri"] += sum(s == MapPointStatus.TRIANGULATED for s in st)
            calls["pend"] += sum(s != MapPointStatus.TRIANGULATED for s in st)
            calls["fresh"] = max(calls["fresh"], len(map_db.map_points))

        monkeypatch.setattr(mh, "match_tracked_features", lockstep)
        world = make_world(n_frames=22, n_landmarks=220, odom_noise=0.004)
        mapper, _, _ = run_sequence(world, default_params(),
                                    with_depth=with_depth)
        check_consistency(mapper.map_db)
        assert calls["n"] >= 20
        assert calls["pend"] > 0 and calls["tri"] > 0 and calls["fresh"] > 50


class TestPipelinedLocalBA:
    """pipelinedLocalBA: deferred BA apply must stay close to the synchronous
    pipeline and keep the map consistent (see docs/ARCHITECTURE.md §4)."""

    def test_trajectory_close_to_synchronous(self):
        world = make_world(n_frames=30, n_landmarks=300, odom_noise=0.002)
        _, poses_sync, _ = run_sequence(world, default_params())
        _, poses_pipe, _ = run_sequence(
            world, default_params(pipelinedLocalBA=True))
        # matching runs on map state lagging one BA apply, so results are not
        # bit-identical — but must stay within a fraction of the scene scale
        errs = [np.linalg.norm(se3.camera_center(a) - se3.camera_center(b))
                for a, b in zip(poses_sync, poses_pipe)]
        assert np.median(errs) < 0.05, np.median(errs)
        assert np.max(errs) < 0.25, np.max(errs)

    def test_consistent_and_finalized_at_end(self):
        world = make_world(n_frames=25, n_landmarks=250, odom_noise=0.002)
        tracker = TrackSimulator(world)
        extractor = FakeOrbExtractor(world, tracker, pix_noise=0.3)
        mapper = Mapper(default_params(pipelinedLocalBA=True),
                        orb_extractor=extractor)
        for i in range(25):
            mapper.advance(make_mapper_input(world, i, tracker))
        # a solve is typically still in flight here; end() must collect it
        assert mapper.end("")
        assert mapper.workspace_ba.pending is None
        check_consistency(mapper.map_db)
        assert len(mapper.map_db.keyframes) >= 5

    def test_recovers_ground_truth(self):
        world = make_world(n_frames=30, n_landmarks=300, odom_noise=0.0)
        mapper, poses, _ = run_sequence(
            world, default_params(pipelinedLocalBA=True))
        check_consistency(mapper.map_db)
        errs = [np.linalg.norm(se3.camera_center(p)
                               - se3.camera_center(world.poses_cw[i]))
                for i, p in enumerate(poses)]
        assert np.median(errs) < 0.05, np.median(errs)
