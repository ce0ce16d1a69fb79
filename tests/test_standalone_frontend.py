"""Standalone descriptor tracker + visualization tests on rendered images."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slam_tpu.params import Parameters, ParametersSlam, StaticSettings
from slam_tpu.frontends.descriptor_tracker import DescriptorTracker


def _rendered_sequence(n=4):
    import bench
    world, patches = bench.render_world(n_frames=n, n_landmarks=300)
    return [bench.render_frame(world, patches, i) for i in range(n)]


@pytest.fixture(scope="module")
def frames():
    return _rendered_sequence(4)


class TestDescriptorTracker:
    def test_tracks_persist_across_frames(self, frames):
        settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=400)))
        tracker = DescriptorTracker(settings, 640, 480)
        t0 = tracker.process(frames[0])
        t1 = tracker.process(frames[1])
        assert len(t0.tracked_id_list) > 30
        carried = set(t0.tracked_id_list.tolist()) & set(t1.tracked_id_list.tolist())
        assert len(carried) > 15, f"only {len(carried)} tracks persisted"
        # track positions move smoothly (scene shifts ~0.12m between frames)
        common = sorted(carried)[:10]
        for tid in common:
            p0 = t0.tracked_pts[list(t0.tracked_id_list).index(tid)]
            p1 = t1.tracked_pts[list(t1.tracked_id_list).index(tid)]
            assert np.linalg.norm(p1 - p0) < 80.0

    def test_fresh_ids_monotonic(self, frames):
        settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=300)))
        tracker = DescriptorTracker(settings, 640, 480)
        seen = set()
        for f in frames:
            tf = tracker.process(f)
            ids = tf.tracked_id_list.tolist()
            assert len(ids) == len(set(ids))  # unique within a frame
            seen.update(ids)
        assert tracker._next_id == max(seen) + 1


class TestViz2d:
    def test_png_roundtrip(self, tmp_path):
        from slam_tpu.utils.viz2d import write_png
        img = np.random.default_rng(0).integers(0, 255, (32, 48, 3)).astype(np.uint8)
        path = str(tmp_path / "t.png")
        write_png(path, img)
        from PIL import Image
        back = np.asarray(Image.open(path))
        assert np.array_equal(back, img)

    def test_overlays_and_map_render(self, tmp_path, frames):
        from slam_tpu.utils.viz2d import PngDebugPublisher
        from synthetic_world import (FakeOrbExtractor, TrackSimulator,
                                     make_mapper_input, make_world)
        from slam_tpu.pipeline.mapper import Mapper
        world = make_world(n_frames=8, n_landmarks=150)
        tracker = TrackSimulator(world)
        mapper = Mapper(Parameters(slam=ParametersSlam(
            useFrontendSlam=False, minVisibleMapPointsInCurrentFrameBA=8,
            localBAProblemSize=12)),
            orb_extractor=FakeOrbExtractor(world, tracker))
        for i in range(8):
            mapper.advance(make_mapper_input(world, i, tracker))
        pub = PngDebugPublisher(str(tmp_path))
        kf = mapper.map_db.latest_keyframe()
        img = np.zeros((480, 640), np.uint8)
        p1 = pub.visualize_keyframe(mapper.map_db, img, kf)
        p2 = pub.visualize_orbs(img, kf)
        p3 = pub.visualize_map(mapper.map_db)
        for p in (p1, p2, p3):
            assert os.path.exists(p) and os.path.getsize(p) > 100
