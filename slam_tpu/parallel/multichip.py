"""Multi-chip SHARDING SMOKE TEST over the production kernels.

Scope note (be precise about what this is): the step below exercises every
production kernel family under a two-axis (``data`` x ``hyp``) GSPMD
sharding, but its per-frame SEMANTICS are a demo shape — frames matched to
their rolled neighbors, mutual-NN instead of the greedy one-to-one
matchers, a fixed 2-pose BA, and degenerate-input fallbacks that fabricate
matches so tiny random inputs still exercise the solvers. It validates
that the kernels partition and compile over a mesh, not that a deployed
pipeline runs this step. The PRODUCTION multi-chip demonstration is the
sharded device-resident SLAM scan (`pipeline/device_vo.BatchedDeviceVO`
with ``mesh=``; per-frame semantics identical to single-chip serving),
which `__graft_entry__.dryrun_multichip` also runs, and which
tests/test_device_vo.py verifies matches the unsharded run exactly.

One jitted "update step" covering every dense stage of the SLAM pipeline
for a BATCH of frame pairs, built from the same kernels the single-chip
pipeline dispatches:

  - fused ORB front-end (`ops/frontend._extract_impl`: MXU pyramid chain,
    detector, IC-angle, rotated BRIEF, BoW quantization),
  - dense Hamming matching (`ops/hamming.hamming_matrix` popcount-GEMM),
  - essential-matrix RANSAC over bearings
    (`ops/ransac._essential_ransac_core`, hypothesis bank sharded),
  - pose recovery + two-view triangulation from the step's own matches
    (`ops/ransac.recover_pose_from_E_jax`),
  - Sim3 RANSAC over the triangulated point sets
    (`ops/ransac._sim3_ransac_core`, hypothesis bank sharded),
  - one bundle-adjustment LM solve over the pair's own poses/points/
    observations (`ops/ba._lm_run`, the production solver).

Frames ride the ``data`` mesh axis; both RANSAC hypothesis banks ride
``hyp``. Shardings are declared with ``NamedSharding``/``PartitionSpec`` and
GSPMD partitions the whole step — no hand-written collectives are needed
because the batch axes are embarrassingly parallel (SURVEY.md §2: the
reference has no distributed state to synchronize; the map stays on host).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_tpu.ops import ba, camera_jax
from slam_tpu.ops.frontend import _extract_impl
from slam_tpu.ops.hamming import MASK_DIST, hamming_matrix, mutual_nn
from slam_tpu.ops.matching import HAMMING_DIST_THR_LOW
from slam_tpu.ops.ransac import (_essential_ransac_core, _sim3_ransac_core,
                                 recover_pose_from_E_jax)
from slam_tpu.params import StaticSettings


class MultichipStep(NamedTuple):
    keypoints: jnp.ndarray        # (B, N, 2) detected/tracked keypoints
    descriptors: jnp.ndarray      # (B, N, 8) uint32 ORB descriptors
    essential_inliers: jnp.ndarray  # (B,) inlier counts of the E-RANSAC
    sim3_inliers: jnp.ndarray     # (B,) inlier counts of the Sim3 RANSAC
    poses: jnp.ndarray            # (B, 2, 4, 4) BA-refined pair poses
    points: jnp.ndarray           # (B, M, 3) BA-refined triangulated points
    ba_cost: jnp.ndarray          # (B,) final BA cost


def _mutual_match(desc_a, desc_b, valid_a, valid_b):
    """Dense mutual-nearest matching with the production distance kernel.

    Device analog of the greedy host matchers (`ops/matching.py` semantics
    reference): THR_LOW acceptance + mutual-consistency in place of the
    sequential one-to-one claim (keyframe_matcher.cpp:160-293).
    """
    dist = hamming_matrix(desc_a, desc_b)
    dist = jnp.where(valid_a[:, None] & valid_b[None, :], dist,
                     jnp.int32(MASK_DIST))
    nn_ab, ok = mutual_nn(dist, HAMMING_DIST_THR_LOW)
    return nn_ab, valid_a & ok


def _pair_step(feats_a, feats_b, ess_keys, sim3_keys,
               cam_kind, cam_params, ba_capacity, ba_iterations):
    """Full dense chain for ONE frame pair; vmapped over the batch.

    Geometry contractions (RANSAC cores, triangulation, BA) are pinned to
    full-f32 matmul passes — the TPU default's bf16 passes corrupt
    pose-scale results (see ops/ba._lm_run)."""
    with jax.default_matmul_precision("highest"):
        return _pair_step_impl(feats_a, feats_b, ess_keys, sim3_keys,
                               cam_kind, cam_params, ba_capacity,
                               ba_iterations)


def _pair_step_impl(feats_a, feats_b, ess_keys, sim3_keys,
                    cam_kind, cam_params, ba_capacity, ba_iterations):
    pts_a, valid_a, desc_a = feats_a
    pts_b, valid_b, desc_b = feats_b

    nn, real_good = _mutual_match(desc_a, desc_b, valid_a, valid_b)
    # degenerate-input guard: with < 8 matches the pair carries no usable
    # geometry, but the RANSAC sampling distribution must stay well-defined
    # under jit; reported inlier counts are masked back to the REAL matches
    # below so a garbage pair scores ~0 instead of the padded fallback
    degenerate = jnp.sum(real_good) < 8
    good = jnp.where(degenerate, jnp.ones_like(real_good), real_good)
    pix_a = pts_a
    pix_b = pts_b[nn]

    # bearings on device (host pipeline uses geometry/camera.py equivalents)
    b1 = camera_jax.unproject(cam_kind, cam_params, pix_a)
    b2 = camera_jax.unproject(cam_kind, cam_params, pix_b)

    # --- essential RANSAC over the pair's own bearing matches
    E, ess_score, ess_inl = _essential_ransac_core(ess_keys, b1, b2, good)
    ess_inl = ess_inl & good & real_good

    # --- pose recovery + triangulation from the matches (cheirality vote)
    R21, t21, pts_c1, tri_ok = recover_pose_from_E_jax(E, b1, b2, ess_inl)
    tri_ok = jnp.where(jnp.sum(tri_ok) >= 3, tri_ok, jnp.ones_like(tri_ok))
    pts_c1 = jnp.where(tri_ok[:, None], pts_c1,
                       jnp.asarray([0.0, 0.0, 5.0], pts_c1.dtype))
    pts_c2 = pts_c1 @ R21.T + t21

    # --- Sim3 RANSAC between the two camera-frame point sets (the
    # loop-closure solver running on this step's own geometry)
    repro1, vis1 = camera_jax.project(cam_kind, cam_params, pts_c1)
    repro2, vis2 = camera_jax.project(cam_kind, cam_params, pts_c2)
    chi = jnp.full(pts_c1.shape[:1], 9.21034, pts_c1.dtype)
    s_count, _, _, _, _ = _sim3_ransac_core(
        sim3_keys, pts_c1, pts_c2, tri_ok, repro1, repro2, vis1, vis2,
        chi, chi, cam_params, cam_params, cam_kind, cam_kind, "SIM3", False)

    # --- bundle adjust the pair with the production LM solver: pose 0 fixed
    # at identity, pose 1 seeded from the recovered relative pose, landmarks
    # from the step's own triangulation, measurements = normalized pixels.
    M = ba_capacity
    order = jnp.argsort(~tri_ok)  # valid points first, static shape
    sel = order[:M]
    pts0 = pts_c1[sel]
    pt_ok = tri_ok[sel]
    pose1 = jnp.eye(4, dtype=pts_c1.dtype)
    pose2 = pose1.at[:3, :3].set(R21).at[:3, 3].set(t21)
    meas1 = b1[sel][:, :2] / jnp.maximum(b1[sel][:, 2:3], 1e-6)
    meas2 = b2[sel][:, :2] / jnp.maximum(b2[sel][:, 2:3], 1e-6)
    problem = ba.BAProblem(
        poses=jnp.stack([pose1, pose2]),
        pose_fixed=jnp.asarray([True, False]),
        points=pts0,
        points_fixed=~pt_ok,
        obs_kf=jnp.concatenate([jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32)]),
        obs_mp=jnp.concatenate([jnp.arange(M, dtype=jnp.int32)] * 2),
        obs_meas=jnp.concatenate([meas1, meas2]).astype(jnp.float32),
        obs_sqrt_info=jnp.full((2 * M,), 100.0, jnp.float32),
        obs_valid=jnp.concatenate([pt_ok, pt_ok]),
        pe_a=jnp.zeros(1, jnp.int32), pe_b=jnp.ones(1, jnp.int32),
        pe_meas=pose2[None],     # relative to pose1 = identity
        pe_sqrt_info=jnp.eye(6, dtype=jnp.float32)[None] * 0.1,
        pe_valid=jnp.ones(1, bool),
        pr_idx=jnp.zeros(1, jnp.int32),
        pr_meas=pose1[None],
        pr_sqrt_info=jnp.zeros((1, 6, 6), jnp.float32),
        pr_valid=jnp.zeros(1, bool),
    )
    res = ba._lm_run(problem, iterations=ba_iterations, cg_iters=0,
                     huber_delta=float(np.sqrt(5.991)), init_lambda=1e-4)
    ess_count = jnp.sum(ess_inl)
    return (ess_count, s_count, res.poses, res.points, res.cost)


def build_update_step(mesh: Mesh, width: int, height: int,
                      max_keypoints: int = 64, hypotheses: int = 16,
                      ba_capacity: int = 32, ba_iterations: int = 3,
                      camera=None):
    """Compile the full sharded update step for a given geometry.

    Returns ``step(images, ess_keys, sim3_keys)`` where images is (B, H, W)
    sharded over ``data`` and both key banks are (B, hypotheses, 2) sharded
    over (``data``, ``hyp``). The front-end, matcher, RANSAC and BA stages
    are the production kernels — no multichip-only math.
    """
    from slam_tpu.params import Parameters, ParametersSlam

    settings = StaticSettings(Parameters(slam=ParametersSlam(
        maxKeypoints=max_keypoints)))
    p = settings.parameters.slam
    scale_factors = tuple(float(s) for s in settings.scaleFactors)
    from slam_tpu.ops.frontend import _min_distances
    from slam_tpu.ops.pyramid import level_sizes
    sizes = level_sizes(width, height, scale_factors)
    budgets = tuple(settings.maxNumberOfKeypointsPerLevel())
    spec = (scale_factors, budgets, tuple(_min_distances(settings, sizes)),
            int(p.orbLkTrackLevel),
            p.slamFeatureDetector.lower() == "fast", width, height,
            0)  # no retrieval in the pair step: a nonzero size would bake
                # the 65536-word codebook + a per-frame quantization GEMM
                # into the executable with nobody reading the words

    if camera is None:
        from slam_tpu.geometry.camera import PinholeCamera
        camera = PinholeCamera(fx=0.8 * width, fy=0.8 * width,
                               cx=width / 2.0, cy=height / 2.0,
                               width=width, height=height)
    cam_kind, cam_params_np = camera_jax.pack_camera(camera)
    cam_params = jnp.asarray(cam_params_np)

    data_sh = NamedSharding(mesh, P("data"))
    key_sh = NamedSharding(mesh, P("data", "hyp"))
    n_tracked = 8  # no LK tracks in the batched offline path; slots masked off

    def step(images, ess_keys, sim3_keys):
        txy = jnp.zeros((n_tracked, 2), jnp.float32)
        tvalid = jnp.zeros((n_tracked,), bool)

        def frontend(img):
            pts, octv, ang, desc, valid, words = _extract_impl(
                img.astype(jnp.float32), txy, tvalid, spec)
            return pts, valid, desc

        feats = jax.vmap(frontend)(images)
        # match frame b against frame (b+1) mod B
        feats_next = jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), feats)
        ess_inl, s3_inl, poses, points, cost = jax.vmap(
            lambda fa, fb, ke, ks: _pair_step(
                fa, fb, ke, ks, cam_kind, cam_params,
                ba_capacity, ba_iterations))(
            feats, feats_next, ess_keys, sim3_keys)
        return MultichipStep(keypoints=feats[0], descriptors=feats[2],
                             essential_inliers=ess_inl, sim3_inliers=s3_inl,
                             poses=poses, points=points, ba_cost=cost)

    return jax.jit(step, in_shardings=(data_sh, key_sh, key_sh),
                   out_shardings=None)


def make_key_banks(batch: int, hypotheses: int, seed: int = 0):
    """Host-side PRNG key banks for both RANSAC stages, shaped (B, K, 2)."""
    root = jax.random.PRNGKey(seed)
    keys = jax.random.split(root, 2 * batch * hypotheses)
    keys = np.asarray(keys).reshape(2, batch, hypotheses, 2)
    return keys[0], keys[1]
