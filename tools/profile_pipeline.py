#!/usr/bin/env python
"""Instrumented benchmark pipeline: steady-state per-stage host timings.

Runs the same rendered-world pipeline as bench.py but resets the stage
timers after warmup and splits prefetch/advance wall time, so the printed
table reflects ONLY steady-state frames (bench.py's own timers would be
dominated by the first-frame remote compiles). Run solo on the TPU:

  python tools/profile_pipeline.py            # ~15 min incl. prewarm

Compare against docs/PERF_BASELINE.md by shape, not absolute values —
single runs swing with tunnel and host-CPU noise.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench
from slam_tpu.map.keyframe import MapperInput, Pose
from slam_tpu.params import Parameters, ParametersSlam, StaticSettings
from slam_tpu.pipeline.mapper import Mapper
from slam_tpu.utils import timer


def main(n_frames=36, n_warm=6):
    world, patches = bench.render_world(n_frames=n_frames)

    def make_params():
        return Parameters(slam=ParametersSlam(
            keyframeDecisionMinIntervalSeconds=0.0,
            minVisibleMapPointsInCurrentFrameBA=8,
            localBAProblemSize=16, adjacentSpaceSize=10, maxKeypoints=600,
            pipelinedLocalBA=True, useFrontendSlam=False))

    def make_input(i):
        return MapperInput(
            frame=bench.render_frame(world, patches, i), camera=world.camera,
            track_ids=np.zeros(0, np.int64),
            track_pts=np.zeros((0, 2), np.float32), track_depths=None,
            pose_trail=[Pose(frame_number=j, t=world.times[j],
                             pose_cw=world.odometry_cw[j].copy())
                        for j in range(i, max(-1, i - 6), -1)],
            t=world.times[i])

    bench._prewarm_ba_buckets(StaticSettings())
    inputs = [make_input(i) for i in range(n_frames)]
    # throwaway full pass: absorbs every remaining first-use compile
    # (matcher/front-end buckets appear mid-sequence as the map grows; a
    # 6-frame warmup is not enough and one remote compile anywhere stalls
    # the device stream for seconds, poisoning the BA dispatch timings)
    warm_mapper = Mapper(make_params())
    for i in range(n_frames):
        warm_mapper.advance(inputs[i])

    mapper = Mapper(make_params())
    for i in range(n_warm):
        mapper.advance(inputs[i])

    ts = timer.enable_timing()
    tp, ta = [], []
    t_all0 = time.perf_counter()
    for i in range(n_warm, n_frames):
        t0 = time.perf_counter()
        if i + 1 < n_frames:
            mapper.prefetch(inputs[i + 1])
        t1 = time.perf_counter()
        mapper.advance(inputs[i])
        t2 = time.perf_counter()
        tp.append(t1 - t0)
        ta.append(t2 - t1)
    dt = time.perf_counter() - t_all0
    n = n_frames - n_warm
    print(f"fps={n / dt:.2f}  prefetch_ms mean={1e3 * np.mean(tp):.2f} "
          f"p90={1e3 * np.percentile(tp, 90):.2f}")
    print(f"advance_ms  mean={1e3 * np.mean(ta):.2f} "
          f"p90={1e3 * np.percentile(ta, 90):.2f}")
    print(ts.table())


if __name__ == "__main__":
    main()
