"""Loop-closure end-to-end test on a square synthetic loop with odometry drift."""
import numpy as np
import pytest

from slam_tpu.geometry import se3
from slam_tpu.params import Parameters, ParametersSlam
from slam_tpu.pipeline.mapper import Mapper
from slam_tpu.pipeline.mapper_helpers import check_consistency

from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                             make_mapper_input, make_world)


def loop_params(**overrides):
    base = dict(
        keyframeDecisionMinIntervalSeconds=0.0,
        keyframeDecisionCovisibilityRatio=0.95,
        minVisibleMapPointsInCurrentFrameBA=8,
        localBAProblemSize=12,
        adjacentSpaceSize=8,
        useFrontendSlam=False,
        minLoopClosureFeatureMatches=15,
        loopClosureRansacMinInliers=12,
        loopClosureRansacIterations=100,
        maximumDriftMetersPerSecond=0.2,
        maximumDriftMetersPerTraveled=0.2,
        maximumDriftRadiansPerSecond=0.2,
        maximumDriftRadiansPerTraveled=0.2,
    )
    base.update(overrides)
    return Parameters(slam=ParametersSlam(**base))


@pytest.mark.slow
class TestLoopClosure:
    def test_loop_closes_and_adds_edge(self):
        per_side = 15
        lap = 4 * per_side
        n_frames = lap + 14
        world = make_world(n_frames=n_frames, n_landmarks=500,
                           trajectory="loop", odom_drift=0.003, seed=4,
                           lap_frames=lap)
        tracker = TrackSimulator(world, max_tracks=50)
        extractor = FakeOrbExtractor(world, tracker)
        mapper = Mapper(loop_params(), orb_extractor=extractor)
        drift_before_closure = None
        for i in range(n_frames):
            pose, _ = mapper.advance(make_mapper_input(world, i, tracker))
            if i == n_frames - 11 and drift_before_closure is None:
                drift_before_closure = np.linalg.norm(
                    se3.camera_center(pose)
                    - se3.camera_center(world.poses_cw[i]))
        check_consistency(mapper.map_db)
        assert len(mapper.map_db.loop_closure_edges) >= 1, \
            "expected at least one accepted loop closure"
        edge = mapper.map_db.loop_closure_edges[0]
        assert int(edge.kf_id2) > int(edge.kf_id1)
        # after closure + global BA the final revisit poses should be closer
        # to the ground truth than the accumulated odometry drift
        final = mapper.map_db.latest_keyframe()
        err_final = np.linalg.norm(se3.camera_center(final.pose_cw)
                                   - se3.camera_center(world.poses_cw[int(final.id)]))
        # sanity: the correction did not blow the trajectory up
        assert err_final < 0.2, err_final
        assert mapper.end("")

    def test_no_false_loop_on_line(self):
        world = make_world(n_frames=30, n_landmarks=300, trajectory="line")
        tracker = TrackSimulator(world)
        extractor = FakeOrbExtractor(world, tracker)
        mapper = Mapper(loop_params(), orb_extractor=extractor)
        for i in range(30):
            mapper.advance(make_mapper_input(world, i, tracker))
        assert len(mapper.map_db.loop_closure_edges) == 0
