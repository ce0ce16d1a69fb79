"""BASELINE config 2: frame-pair tracking on rendered images.

Two rendered frames -> TPU ORB front-end -> Hamming match (ratio +
symmetry) -> essential-matrix RANSAC -> relative pose, compared to ground
truth. Exercises the full front half of the pipeline on real pixels.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slam_tpu.geometry import se3
from slam_tpu.ops import ransac
from slam_tpu import native
from slam_tpu.params import Parameters, ParametersSlam, StaticSettings
from slam_tpu.ops.frontend import OrbExtractor


@pytest.mark.slow
def test_frame_pair_essential_pose():
    import bench
    # moderate landmark density: overlapping texture splats create
    # composite corners that are appearance-stable but geometrically
    # inconsistent (real-world clutter analogue); keep density moderate
    world, patches = bench.render_world(n_frames=10, n_landmarks=250)
    f0 = bench.render_frame(world, patches, 0)
    f5 = bench.render_frame(world, patches, 2)

    settings = StaticSettings(Parameters(slam=ParametersSlam(maxKeypoints=800)))
    ex = OrbExtractor(settings, 640, 480)
    r0 = ex.detect_and_extract(f0).compact()
    r5 = ex.detect_and_extract(f5).compact()
    assert len(r0.pts) > 200 and len(r5.pts) > 200

    dist = native.hamming_matrix(r0.descriptors, r5.descriptors)
    order = np.argsort(dist, axis=1)[:, :2]
    best = dist[np.arange(len(r0.pts)), order[:, 0]]
    second = dist[np.arange(len(r0.pts)), order[:, 1]]
    ok = (best <= 50) & (best < 0.8 * second)
    back = np.argmin(dist, axis=0)
    ok &= back[order[:, 0]] == np.arange(len(r0.pts))
    # motion gate: the camera moves ~0.6 m sideways; disparities are bounded
    disp = np.linalg.norm(r0.pts - r5.pts[order[:, 0]], axis=1)
    ok &= disp < 150.0
    i0 = np.where(ok)[0]
    i5 = order[i0, 0]
    assert len(i0) >= 25, f"only {len(i0)} putative matches"

    cam = world.camera
    b0, _ = cam.pixel_to_ray(r0.pts[i0])
    b5, _ = cam.pixel_to_ray(r5.pts[i5])
    res = ransac.essential_ransac(b0, b5, iterations=2000)
    assert res.ok
    assert res.inliers.sum() >= 10

    # ground-truth relative pose frame5 <- frame0
    T0 = world.poses_cw[0]
    T5 = world.poses_cw[2]
    rel = T5 @ np.linalg.inv(T0)
    R_true = rel[:3, :3]
    t_true = rel[:3, 3] / np.linalg.norm(rel[:3, 3])
    rots, transes = ransac.decompose_E(res.E_21)
    rot_err = min(np.degrees(np.linalg.norm(se3.so3_log(r.T @ R_true)))
                  for r in rots)
    t_err = min(np.degrees(np.arccos(np.clip(abs(np.dot(t, t_true)), -1, 1)))
                for t in transes)
    # an 8-point estimate from ~a dozen noisy inliers is coarse; the pipeline
    # itself never uses the essential pose (odometry priors drive it, like
    # the reference where the RANSAC path exists for completeness,
    # essential_solver.cc / SURVEY 2.21) — this test checks the wiring
    assert rot_err < 4.0, f"rotation error {rot_err:.2f} deg"
    assert t_err < 10.0, f"translation direction error {t_err:.2f} deg"
