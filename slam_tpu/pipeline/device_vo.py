"""Device-resident batched VO backend: the map lives in HBM, the whole
per-frame backend step is ONE piece of a jitted program.

The interactive pipeline (`pipeline/mapper.py`) keeps the map on host and
dispatches fused kernels per stage — the right trade for a single live
session with loop closure. This module is the serving/offline-throughput
counterpart: S independent sequences are processed with `vmap`, T frames per
dispatch with `lax.scan`, and the landmark store (static capacity + masks)
stays on device between dispatches, so per-frame host work and host<->device
transfers drop to zero. This is the TPU-native analogue of the reference's
backend thread (`mapper.cpp:229-279`) for the `backendOnly` path
(mapper.cpp:406-434): odometry-seeded pose, projection matching against the
map, pose-only bundle adjustment, two-view triangulation of new landmarks,
staleness culling.

Every numeric stage is a production kernel:
  - fused ORB front-end          `ops/frontend._extract_impl`
  - popcount-GEMM matching       `ops/hamming.hamming_matrix`
  - pose-only BA                 specialized single-pose LM (poseBundleAdjust
                                 semantics: fixed prev pose + fixed map
                                 points + odometry prior edge,
                                 bundle_adjuster.cpp:396-491)
  - two-view triangulation       `ops/ransac.triangulate_two_view_jax`
  - sliding-window local BA      `ops/ba._lm_run` over the last K frame
                                 poses + landmark observation store
                                 (`_window_ba`; localBundleAdjust analogue,
                                 bundle_adjuster.cpp:141-394) when
                                 ``cfg.window > 0``
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import ba, camera_jax
from slam_tpu.ops.frontend import _extract_impl, _min_distances
from slam_tpu.ops.hamming import MASK_DIST, hamming_matrix, mutual_nn
from slam_tpu.ops.matching import HAMMING_DIST_THR_LOW
from slam_tpu.ops.pyramid import level_sizes
from slam_tpu.ops.ransac import triangulate_two_view_jax
from slam_tpu.params import Parameters, ParametersSlam, StaticSettings


class VOState(NamedTuple):
    """Per-sequence device-resident map/tracking state (static capacity).

    Landmarks are anchored: position = anchor_origin + depth * anchor_ray
    (world frame). Re-observations refine ``depth`` by 1-D Gauss-Newton on
    the current reprojection, blended over the observation count — the
    device-friendly counterpart of the interactive pipeline's landmark
    re-triangulation + local BA position updates.

    When ``cfg.window > 0`` the state additionally carries a sliding
    keyframe window (pose ring of the last K frames + a landmark x window
    observation store) consumed by the device-resident local BA
    (`_window_ba`); with the window disabled these fields are kept at
    capacity 1 and never touched."""
    pose_cw: jnp.ndarray        # (4, 4) current world->camera pose
    lm_pos: jnp.ndarray         # (M, 3) landmark positions, world frame
    lm_desc: jnp.ndarray        # (M, 8) uint32 ORB descriptors
    lm_valid: jnp.ndarray       # (M,) slot occupancy
    lm_last_seen: jnp.ndarray   # (M,) frame index of last observation
    lm_anchor_origin: jnp.ndarray  # (M, 3) camera center at creation
    lm_anchor_ray: jnp.ndarray     # (M, 3) unit world ray at creation
    lm_depth: jnp.ndarray          # (M,) depth along the anchor ray
    lm_n_obs: jnp.ndarray          # (M,) observation count
    lm_octave: jnp.ndarray         # (M,) pyramid octave of the latest
    #                                observation's keypoint (per-observation
    #                                levelSigmaSq for the closure gates,
    #                                loop_ransac.cpp:28-40)
    lm_created: jnp.ndarray        # (M,) frame index at creation: the
    #                                "corrected region" predicate of
    #                                correctLoop (loop_closer.cpp:492-506 —
    #                                only map points of the corrected
    #                                keyframes are re-expressed)
    prev_pts: jnp.ndarray       # (N, 2) previous frame keypoints
    prev_desc: jnp.ndarray      # (N, 8) previous frame descriptors
    prev_free: jnp.ndarray      # (N,) prev keypoints not matched to the map
    prev_pose_cw: jnp.ndarray   # (4, 4)
    frame_idx: jnp.ndarray      # () int32
    # --- sliding-window local-BA state (ring indexed by frame_idx % K)
    win_pose_cw: jnp.ndarray    # (K, 4, 4) poses of the last K frames
    win_valid: jnp.ndarray      # (K,) slot occupancy
    win_odo: jnp.ndarray        # (K, 4, 4) odometry delta prev->this frame
    wobs_meas: jnp.ndarray      # (M, K, 2) normalized-camera measurements
    wobs_valid: jnp.ndarray     # (M, K) observation validity
    # --- loop-candidate signature ring (capacity 1 when detection is off)
    sig_ring: jnp.ndarray       # (R, W) L2-normalized word histograms
    sig_frame: jnp.ndarray      # (R,) frame index of each signature, -1=empty
    # --- loop-closure snapshot ring, stored at the same cadence/slots as
    # sig_ring: up to P matched landmarks of the stored frame as camera-frame
    # 3D points + descriptors + normalized observations, plus the pose. This
    # is exactly what the host closure stack consumes (LoopRansac operates on
    # matched map points expressed in the two KFs' camera frames,
    # loop_ransac.cpp:8-45) — and it survives landmark culling, so a revisit
    # can close against a region whose landmarks left the live map long ago.
    sig_pc: jnp.ndarray         # (R, P, 3) camera-frame landmark points
    sig_desc: jnp.ndarray       # (R, P, 8) uint32 descriptors
    sig_obs: jnp.ndarray        # (R, P, 2) normalized-camera observations
    sig_pvalid: jnp.ndarray     # (R, P) row validity
    sig_pose: jnp.ndarray       # (R, 4, 4) pose_cw at storage time
    sig_octave: jnp.ndarray     # (R, P) keypoint octave per snapshot row


class SnapOut(NamedTuple):
    """Closure-snapshot ring rows written during one chunk, returned as part
    of the chunk output so the host can MIRROR the ring for free: the rows
    ride the per-chunk fused transfer instead of costing the closure
    consumer a dedicated ~26 ms device_get per attempt
    (pipeline/device_slam.py keeps the mirror). Leading axis = stored slots
    this chunk (T // loop_every)."""
    slot: jnp.ndarray           # (C,) ring slot index
    frame: jnp.ndarray          # (C,) frame index stored there
    pc: jnp.ndarray             # (C, P, 3)
    desc: jnp.ndarray           # (C, P, 8)
    obs: jnp.ndarray            # (C, P, 2)
    pvalid: jnp.ndarray         # (C, P)
    pose: jnp.ndarray           # (C, 4, 4)
    octave: jnp.ndarray         # (C, P)


class VOStepOut(NamedTuple):
    pose_cw: jnp.ndarray        # (4, 4) optimized pose for the frame
    n_matched: jnp.ndarray      # () matched landmarks used by pose BA
    n_new: jnp.ndarray          # () landmarks inserted this frame
    loop_frame: jnp.ndarray     # () int32 best time-gated revisit candidate
    #                                frame index, -1 = none above the gate
    loop_score: jnp.ndarray     # () f32 cosine retrieval score of that
    #                                frame; -1.0 when loop_frame == -1 (all
    #                                candidates masked), 0.0 when detection
    #                                is off — check loop_frame first


class DeviceVOConfig(NamedTuple):
    width: int
    height: int
    lm_capacity: int = 512
    max_keypoints: int = 600
    match_radius_px: float = 20.0
    stale_age: int = 12
    ba_iterations: int = 4
    min_parallax_cos: float = 0.999995   # ~0.18 deg two-ray angle gate
    # creation gates on the cur<->prev descriptor matches: epipolar residual
    # under the frame-pair relative pose (the triangulation matcher's gate,
    # keyframe_matcher.cpp:23-44 / epipolarCheckThresholdDegrees) and a
    # both-frame reprojection check of the triangulated point. Without them
    # repeating textures mint bogus landmarks from pure-Hamming mutual-NN
    # matches and the map drags the pose solve off the trajectory.
    epipolar_thr_deg: float = 0.5
    max_reproj_px: float = 2.0
    # pose-BA trust balance: reprojection terms are weighted
    # focal * obs_weight_scale * maturity, maturity ramping with the
    # landmark's observation count (fresh two-view landmarks carry the
    # anchor pose's error, so they must not outvote the odometry edge).
    # The window BA uses focal * obs_weight_scale (joint optimization
    # refines the landmarks themselves, so no maturity discount by
    # default). Best accuracy on the EuRoC-class room sequence is the
    # frozen-map preset (stale_age >= episode, max_depth_step = 0) PLUS
    # `window=8`: ATE beats both raw odometry and pose-only VO at every
    # measured drift level (RESULTS.md table, real-TPU runs).
    obs_weight_scale: float = 1.0
    maturity_ramp: float = 8.0
    maturity_floor: float = 0.125
    # odometry-prior information weights (EdgeSE3Expmap information,
    # mapper_helpers.cpp:911-956 semantics). DEFAULTS ARE MEASURED, not
    # inherited from the interactive pipeline's 100/1000: the device path
    # has no odometry-uncertainty input, so the fixed weight must keep the
    # solve anchored to its prior until the map has earned trust. At
    # 1000/10000 (with window=8) the VO beats the fed odometry at EVERY
    # measured drift level on both the distinct-texture and the
    # repeating-texture worlds (tools/sweep_device_vo.py matrix in
    # RESULTS.md); at the old 100/1000 it lost to near-perfect odometry by
    # 2x at low drift (VO noise floor unanchored).
    odom_pos_weight: float = 1000.0
    odom_rot_weight: float = 10000.0
    max_depth_step: float = 0.1          # per-observation relative depth move
    # sliding-window device-resident local BA (localBundleAdjust analogue,
    # bundle_adjuster.cpp:141-394, run entirely inside the jitted scan): a
    # ring of the last `window` frame poses plus a landmark x window
    # observation store feed the production LM/dense-Schur solver
    # (`ops/ba._lm_run`) every `window_ba_every` frames — joint pose +
    # landmark refinement with chi2 observation pruning (:376-388). 0 = off
    # (pose-only VO). The BA cadence is a STATIC schedule (scan over
    # frame groups), not a traced cond: under vmap a cond lowers to select
    # and would run the solve every frame for every sequence.
    # DEFAULT = 8, MEASURED: the sweep_device_vo matrix (RESULTS.md) shows
    # default+window8 beats the fed odometry at every drift level on both
    # texture worlds, at ~20% scan-throughput cost — so the zero-argument
    # config ships the accuracy-winning setting (round-4 verdict item 4).
    # NOTE: with window > 0 chunk lengths must divide window_ba_every.
    window: int = 8
    window_ba_every: int = 4
    window_ba_iters: int = 3
    # free landmark positions in the window solve. True = full joint BA
    # (best on distinctive textures: the dot-world drift scenario improves
    # 0.119 -> 0.072 m). False = poses-only multi-frame smoothing: on
    # ambiguous/repeating textures joint optimization feeds wrong-match
    # error back into the map (the failure mode the frozen-map preset of
    # run_device_vo_euroc guards against), so the map stays read-only and
    # only the pose window is re-estimated.
    window_free_points: bool = True
    # weight window reprojection terms by landmark maturity (same ramp as
    # the pose-only BA) instead of uniformly
    window_maturity_weight: bool = False
    # Lowe second-best ratio for the mutual-NN matchers (map matching and
    # landmark creation); 1.0 = off. The reference's
    # loopClosureFeatureMatchLoweRatio gate: on repeating textures a
    # near-tie means the association is ambiguous — essential when the
    # window observation store re-asserts each match for `window` frames.
    match_lowe_ratio: float = 1.0
    # Device-resident loop-candidate detection: the serving-path analogue
    # of the BoW index (reference: bow_index.cpp:59-176 getBowSimilar +
    # the too-close-in-time fast rejection, loop_closer.cpp:164-187),
    # run entirely inside the jitted scan. Every `loop_every` frames the
    # frame's L2-normalized word histogram — words quantized against a
    # `loop_words`-row stride of the trained retrieval vocabulary with ONE
    # Hamming MXU GEMM — is stored into an R-slot signature ring; EVERY
    # frame queries the ring with one GEMV and reports the best candidate
    # at least `loop_min_gap` frames in the past. The host consumes
    # (loop_frame, loop_score) per chunk and runs the full geometric
    # verification + closure stack (Sim3 RANSAC -> refinement -> correct)
    # on flagged pairs only. 0 = off (ring kept at capacity 1, untouched).
    loop_every: int = 0
    loop_slots: int = 64
    loop_words: int = 512
    loop_min_gap: int = 30
    # candidates within this many frames of being overwritten (ring span =
    # loop_slots * loop_every) are not flagged: the host consumes flags one
    # chunk late, and a candidate whose slot is recycled in flight is
    # useless (and on multi-lap sessions score TIES resolve to the oldest
    # slot, which is exactly the about-to-die one). Must exceed the chunk
    # length used by the consumer.
    loop_stale_guard: int = 16
    # snapshot capacity: matched landmarks stored per ring slot for the host
    # closure stack (camera-frame points + descriptors + observations)
    loop_points: int = 192
    # score gate: below it loop_frame reports -1. NOTE: 0.0 DISABLES the
    # gate (the permissive extreme) — once any ring entry passes the time
    # gate every frame reports a candidate, and a host consuming
    # loop_candidates() would run geometric verification on every frame.
    # `calibrate_loop_gate` measures a safe value from a bootstrap segment
    # (non-revisit score quantile); the bowScoreRatio analogue is
    # host-side, relative scoring needs the candidate set.
    loop_min_score: float = 0.0


def _geom_precision(fn):
    """Pin geometry-critical contractions to full-f32 matmul passes.

    The TPU default precision computes f32 contractions as bf16 passes;
    pose products, triangulation and the LM solves amplify that rounding
    into trajectory-scale errors (measured: 0.45 m pose wander at drift=0
    vs 0.05 m on the f32 CPU backend — see ops/ba._lm_run). The wrapped
    functions are latency-bound small-matrix code, so HIGHEST costs
    nothing; the FLOP-heavy image kernels (pyramid, patch gather, integer
    Hamming GEMM) deliberately stay at the fast default."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **kw)
    return wrapped


def _frontend_spec(settings: StaticSettings, width: int, height: int):
    p = settings.parameters.slam
    scale_factors = tuple(float(s) for s in settings.scaleFactors)
    sizes = level_sizes(width, height, scale_factors)
    return (scale_factors, tuple(settings.maxNumberOfKeypointsPerLevel()),
            tuple(_min_distances(settings, sizes)), int(p.orbLkTrackLevel),
            p.slamFeatureDetector.lower() == "fast", width, height,
            0)  # retrieval quantization not needed in the VO core


def _loop_codebook(num_words: int) -> np.ndarray:
    """(W, 8) uint32 retrieval codebook for the device loop detector.

    A uniform stride over the trained 65,536-word hierarchical vocabulary
    (`ops/bow.make_codebook`; tools/train_vocab.py): the vocabulary is
    sorted so the top bits are the tree group, hence striding samples every
    descriptor-space region evenly — a coarse level of the same tree the
    host BowIndex quantizes against (reference: bow_index.cpp:59-93 uses
    tree levelsUp for the same coarse/fine split)."""
    from slam_tpu.ops.bow import make_codebook

    base = make_codebook(65536)
    stride = max(1, len(base) // num_words)
    return np.ascontiguousarray(base[::stride][:num_words])


@_geom_precision
def _match_map(state: VOState, pts, desc, feat_valid, pose_pred,
               cam_kind, cam_params, cfg: DeviceVOConfig):
    """Projection-gated mutual-nearest landmark<->feature matching
    (searchByProjection semantics, keyframe_matcher.cpp:295-414, with the
    radius gate in pixels and THR_LOW acceptance)."""
    pc = state.lm_pos @ pose_pred[:3, :3].T + pose_pred[:3, 3]
    proj, vis = camera_jax.project(cam_kind, cam_params, pc)
    vis = vis & state.lm_valid & (pc[:, 2] > 1e-6)

    dist = hamming_matrix(state.lm_desc, desc)              # (M, N)
    d2 = jnp.sum((proj[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    gate = (vis[:, None] & feat_valid[None, :]
            & (d2 <= cfg.match_radius_px ** 2))
    dist = jnp.where(gate, dist, jnp.int32(MASK_DIST))
    # landmark -> feature mutual-nearest with THR_LOW acceptance
    nn_mf, matched = mutual_nn(dist, HAMMING_DIST_THR_LOW,
                               ratio=cfg.match_lowe_ratio)
    return nn_mf, matched


@_geom_precision
def _pose_ba(state: VOState, pose_pred, meas_xy, matched,
             cfg: DeviceVOConfig, obs_weight):
    """Pose-only bundle adjust (poseBundleAdjust semantics,
    bundle_adjuster.cpp:396-491): previous pose fixed, all landmarks fixed,
    one odometry-prior edge carrying the odometry-predicted relative pose.

    Specialized single-pose LM instead of the generic `ba._lm_run`: with one
    free vertex and fixed points the Schur system collapses to a 6x6 normal
    equation, so the generic solver's 512 Hll block inverses and dense Schur
    assembly are pure serial-latency waste inside the scanned step (measured
    ~2 ms/frame of the VO chain). Same math throughout: identical Huber
    weighting, cost, damping schedule and accept/reject rule as `ba._lm_run`
    on the equivalent 2-pose problem."""
    from slam_tpu.ops import lie

    huber_delta = jnp.float32(np.sqrt(5.991))
    sqrt_info = jnp.diag(jnp.asarray(
        [cfg.odom_rot_weight] * 3 + [cfg.odom_pos_weight] * 3, jnp.float32))
    C = pose_pred @ lie.se3_inverse(state.prev_pose_cw)  # odometry edge meas
    B = state.prev_pose_cw
    X = state.lm_pos
    si = jnp.broadcast_to(obs_weight, (X.shape[0],)).astype(jnp.float32)
    valid = matched

    def reproj_terms(T):
        pc = X @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        zsafe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
        pred = pc[:, :2] / zsafe[:, None]
        r = (pred - meas_xy) * si[:, None]
        chi2 = jnp.sum(r * r, axis=1)
        rnorm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w = jnp.where(valid, jnp.minimum(1.0, huber_delta / rnorm), 0.0)
        inv_z = 1.0 / zsafe
        Jproj = jnp.stack([
            jnp.stack([inv_z, jnp.zeros_like(z), -pc[:, 0] * inv_z * inv_z],
                      axis=-1),
            jnp.stack([jnp.zeros_like(z), inv_z, -pc[:, 1] * inv_z * inv_z],
                      axis=-1)], axis=1)                     # (M, 2, 3)
        Jp_pose = jnp.concatenate(
            [-lie.skew(pc), jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype),
                                             (pc.shape[0], 3, 3))], axis=-1)
        J = (Jproj @ Jp_pose) * (si * jnp.sqrt(w))[:, None, None]  # (M, 2, 6)
        r_w = r * jnp.sqrt(w)[:, None]
        return r_w, J, jnp.where(valid, chi2, 0.0)

    def edge_r(xi, T):
        # EdgeSE3Expmap error with the free (current) pose in the b slot:
        # e = log(inv(exp(xi) T_cur) @ C @ T_prev); zero at T_cur = C T_prev
        return sqrt_info @ lie.se3_log(
            lie.se3_inverse(lie.se3_exp(xi) @ T) @ C @ B)

    zero6 = jnp.zeros(6, jnp.float32)

    def cost_of(T):
        _, _, chi2 = reproj_terms(T)
        cost = jnp.sum(ba._robust_cost(chi2, None, huber_delta) * valid)
        re = edge_r(zero6, T)
        return cost + jnp.sum(re * re)

    def lm_step(carry, _):
        T, lam, cost = carry
        r_w, J, _ = reproj_terms(T)
        re = edge_r(zero6, T)
        Je = jax.jacfwd(lambda xi: edge_r(xi, T))(zero6)     # (6, 6)
        H = (jnp.einsum("oci,ocj->ij", J, J) + Je.T @ Je
             + (lam + 1e-8) * jnp.eye(6, dtype=jnp.float32))
        b = -(jnp.einsum("oci,oc->i", J, r_w) + Je.T @ re)
        dx = jnp.linalg.solve(H, b)
        new_T = lie.se3_exp(dx) @ T
        new_cost = cost_of(new_T)
        accept = new_cost < cost
        T = jnp.where(accept, new_T, T)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (T, lam, cost), None

    (T, _, _), _ = jax.lax.scan(
        lm_step, (pose_pred, jnp.float32(1e-4), cost_of(pose_pred)),
        None, length=cfg.ba_iterations)
    return T


@_geom_precision
def _refine_depths(state: VOState, pose_cw, meas_xy, matched,
                   cfg: DeviceVOConfig):
    """Anchored-depth refinement from the frame's re-observations.

    For each matched landmark, two 1-D Gauss-Newton steps on the current
    normalized-reprojection residual along the anchor ray, then an
    incremental-mean blend over the observation count (approximates the
    least-squares depth over the observation history; the role the local
    BA's landmark update plays in the interactive pipeline)."""
    R = pose_cw[:3, :3]
    t = pose_cw[:3, 3]
    a = state.lm_anchor_origin @ R.T + t            # (M, 3)
    b = state.lm_anchor_ray @ R.T                   # (M, 3)

    def residual(d):
        pc = a + d[:, None] * b
        z = jnp.maximum(pc[:, 2], 1e-6)
        return pc[:, :2] / z[:, None] - meas_xy, pc, z

    d = state.lm_depth
    for _ in range(2):
        e, pc, z = residual(d)
        J = (b[:, :2] * z[:, None] - pc[:, :2] * b[:, 2:3]) / (z * z)[:, None]
        num = jnp.sum(J * e, axis=1)
        den = jnp.maximum(jnp.sum(J * J, axis=1), 1e-12)
        d = d - num / den
    # trust region: one observation may move the depth only a bounded
    # relative amount (limits the drift feedback of refining landmarks
    # against a possibly-off pose)
    ok = matched & (d > 1e-3) & jnp.isfinite(d)
    n = jnp.maximum(state.lm_n_obs, 1).astype(d.dtype)
    d_blend = state.lm_depth + (d - state.lm_depth) / (n + 1.0)
    max_move = cfg.max_depth_step * jnp.maximum(state.lm_depth, 1e-3)
    d_blend = jnp.clip(d_blend, state.lm_depth - max_move,
                       state.lm_depth + max_move)
    depth = jnp.where(ok, d_blend, state.lm_depth)
    n_obs = jnp.where(matched, state.lm_n_obs + 1, state.lm_n_obs)
    pos = state.lm_anchor_origin + depth[:, None] * state.lm_anchor_ray
    return pos, depth, n_obs


@_geom_precision
def _create_landmarks(state: VOState, pose_cw, pts, desc, free_cur,
                      cam_kind, cam_params, cfg: DeviceVOConfig):
    """Two-view triangulation of fresh landmarks from map-free features of
    the current and previous frames (createNewMapPoints analogue,
    mapper_helpers.cpp:271-318, restricted to the frame pair the VO core
    carries)."""
    dist = hamming_matrix(desc, state.prev_desc)
    gate = free_cur[:, None] & state.prev_free[None, :]
    dist = jnp.where(gate, dist, jnp.int32(MASK_DIST))
    nn_cp, mutual = mutual_nn(dist, HAMMING_DIST_THR_LOW,
                              ratio=cfg.match_lowe_ratio)

    b_cur = camera_jax.unproject(cam_kind, cam_params, pts)
    b_prev = camera_jax.unproject(cam_kind, cam_params,
                                  state.prev_pts[nn_cp])
    # camera 1 = previous frame, camera 2 = current frame
    from slam_tpu.ops import lie
    T21 = pose_cw @ lie.se3_inverse(state.prev_pose_cw)

    # epipolar gate under the pair's relative pose: symmetric angular
    # distance of each bearing to the other's epipolar plane
    E = lie.skew(T21[:3, 3]) @ T21[:3, :3]          # b2^T E b1 = 0
    n2 = b_prev @ E.T                                # epipolar normals, cam2
    n1 = b_cur @ E                                   # epipolar normals, cam1
    def _sin(b, n):
        num = jnp.abs(jnp.sum(b * n, axis=-1))
        den = (jnp.linalg.norm(b, axis=-1) * jnp.linalg.norm(n, axis=-1))
        return num / jnp.maximum(den, 1e-12)
    sin_thr = jnp.float32(np.sin(np.radians(cfg.epipolar_thr_deg)))
    epi_ok = (_sin(b_cur, n2) < sin_thr) & (_sin(b_prev, n1) < sin_thr)

    pts_c1, tri_ok = triangulate_two_view_jax(
        T21[:3, :3], T21[:3, 3], b_prev, b_cur)
    # parallax gate: nearly-parallel rays give unusable depths
    d1 = b_prev / jnp.maximum(jnp.linalg.norm(b_prev, axis=-1, keepdims=True), 1e-12)
    r2 = b_cur @ T21[:3, :3]
    r2 = r2 / jnp.maximum(jnp.linalg.norm(r2, axis=-1, keepdims=True), 1e-12)
    parallax_ok = jnp.einsum("ni,ni->n", d1, r2) < cfg.min_parallax_cos

    # both-frame reprojection gate on the triangulated point (the chi2 gate
    # of checkReprojectionError, mapper_helpers.cpp:576-598, flat radius)
    pc2 = pts_c1 @ T21[:3, :3].T + T21[:3, 3]
    proj1, vis1 = camera_jax.project(cam_kind, cam_params, pts_c1)
    proj2, vis2 = camera_jax.project(cam_kind, cam_params, pc2)
    r2max = jnp.float32(cfg.max_reproj_px ** 2)
    reproj_ok = (vis1 & vis2
                 & (jnp.sum((proj1 - state.prev_pts[nn_cp]) ** 2, axis=-1)
                    <= r2max)
                 & (jnp.sum((proj2 - pts) ** 2, axis=-1) <= r2max))

    new_ok = mutual & tri_ok & parallax_ok & epi_ok & reproj_ok

    Rp = state.prev_pose_cw[:3, :3]
    tp = state.prev_pose_cw[:3, 3]
    pos_w = (pts_c1 - tp) @ Rp          # R^T (p - t)
    c_prev = -tp @ Rp                   # previous camera center (anchor)
    ray = pos_w - c_prev
    depth = jnp.linalg.norm(ray, axis=-1)
    ray = ray / jnp.maximum(depth[:, None], 1e-9)
    new_ok = new_ok & (depth > 1e-3)

    # insert into free landmark slots: rank new points, scatter into the
    # lowest-index invalid slots, drop the overflow
    free_slots = jnp.argsort(state.lm_valid)          # invalid slots first
    n_free = state.lm_pos.shape[0] - jnp.sum(state.lm_valid)
    rank = jnp.cumsum(new_ok) - 1
    assign = new_ok & (rank < n_free)
    slot = jnp.where(assign, free_slots[jnp.clip(rank, 0, None)],
                     state.lm_pos.shape[0])           # OOB index -> dropped
    lm_pos = state.lm_pos.at[slot].set(pos_w, mode="drop")
    lm_desc = state.lm_desc.at[slot].set(desc, mode="drop")
    lm_valid = state.lm_valid.at[slot].set(True, mode="drop")
    lm_last_seen = state.lm_last_seen.at[slot].set(state.frame_idx,
                                                   mode="drop")
    lm_anchor_origin = state.lm_anchor_origin.at[slot].set(
        jnp.broadcast_to(c_prev, pos_w.shape), mode="drop")
    lm_anchor_ray = state.lm_anchor_ray.at[slot].set(ray, mode="drop")
    lm_depth = state.lm_depth.at[slot].set(depth, mode="drop")
    lm_n_obs = state.lm_n_obs.at[slot].set(2, mode="drop")
    # normalized-camera measurements of the two creation observations, for
    # the sliding-window observation store (slot rows, OOB slots dropped)
    meas_cur = b_cur[:, :2] / jnp.maximum(b_cur[:, 2:3], 1e-6)
    meas_prev = b_prev[:, :2] / jnp.maximum(b_prev[:, 2:3], 1e-6)
    return (lm_pos, lm_desc, lm_valid, lm_last_seen, lm_anchor_origin,
            lm_anchor_ray, lm_depth, lm_n_obs, assign, slot,
            meas_cur, meas_prev)


@_geom_precision
def _window_ba(state: VOState, cfg: DeviceVOConfig, focal: float) -> VOState:
    """Device-resident sliding-window local bundle adjustment.

    The full localBundleAdjust analogue (bundle_adjuster.cpp:141-394) run
    INSIDE the jitted scan on the window state: joint LM over the last K
    frame poses and all landmarks observed in the window, with
      - normalized-camera reprojection edges from the observation store
        (setMapPointMeasurement semantics, bundle_adjuster.cpp:43-63),
      - odometry-prior SE3 edges between consecutive window frames
        (makeOdometryEdge, :65-85) weighted like the pose-only BA,
      - the oldest window pose fixed (gauge; the island-start fix, :195-223),
      - chi2 > 5.991 observation pruning afterwards (:376-388).
    Solved by the production `ops/ba._lm_run` (dense Schur at these sizes).
    """
    K = int(state.win_pose_cw.shape[0])
    M = int(state.lm_pos.shape[0])
    f32 = state.lm_pos.dtype

    last = jnp.mod(state.frame_idx - 1, K)
    n_valid = jnp.sum(state.win_valid)
    oldest = jnp.mod(state.frame_idx - n_valid, K)
    pose_fixed = ~state.win_valid | (jnp.arange(K) == oldest)

    # odometry edges between consecutive window frames: slot b holds the
    # measured delta prev->b, so edge (a=prev slot, b) has meas C with
    # zero error at pose_b = C @ pose_a (matching ba._pe_error_fn)
    offs = jnp.arange(K - 1)
    pe_b = jnp.mod(last - offs, K)
    pe_a = jnp.mod(last - offs - 1, K)
    pe_valid = state.win_valid[pe_a] & state.win_valid[pe_b]
    sqrt_info = jnp.diag(jnp.asarray(
        [cfg.odom_rot_weight] * 3 + [cfg.odom_pos_weight] * 3, f32))
    pe_sqrt_info = jnp.broadcast_to(sqrt_info, (K - 1, 6, 6))

    # observations: the full (M, K) store flattened to static O = M*K
    obs_valid = (state.wobs_valid & state.lm_valid[:, None]
                 & state.win_valid[None, :])
    nobs_win = jnp.sum(obs_valid, axis=1)
    # landmarks need >= 2 window observations to be a free vertex
    # (minObservationsForBA semantics); others stay fixed anchors
    points_fixed = ~state.lm_valid | (nobs_win < 2)
    if not cfg.window_free_points:
        points_fixed = jnp.ones_like(points_fixed)
    obs_mp = jnp.repeat(jnp.arange(M, dtype=jnp.int32), K)
    obs_kf = jnp.tile(jnp.arange(K, dtype=jnp.int32), M)
    obs_w = jnp.full((M,), focal * cfg.obs_weight_scale, f32)
    if cfg.window_maturity_weight:
        obs_w = obs_w * jnp.clip(
            (state.lm_n_obs.astype(f32) - 1.0) / cfg.maturity_ramp,
            cfg.maturity_floor, 1.0)

    problem = ba.BAProblem(
        poses=state.win_pose_cw.astype(f32),
        pose_fixed=pose_fixed,
        points=state.lm_pos,
        points_fixed=points_fixed,
        obs_kf=obs_kf, obs_mp=obs_mp,
        obs_meas=state.wobs_meas.reshape(M * K, 2),
        obs_sqrt_info=jnp.repeat(obs_w, K),
        obs_valid=obs_valid.reshape(M * K),
        pe_a=pe_a.astype(jnp.int32), pe_b=pe_b.astype(jnp.int32),
        pe_meas=state.win_odo[pe_b],
        pe_sqrt_info=pe_sqrt_info,
        pe_valid=pe_valid,
        pr_idx=jnp.zeros(1, jnp.int32),
        pr_meas=jnp.broadcast_to(jnp.eye(4, dtype=f32), (1, 4, 4)),
        pr_sqrt_info=jnp.zeros((1, 6, 6), f32),
        pr_valid=jnp.zeros(1, bool))
    res = ba._lm_run(problem, cfg.window_ba_iters,
                     ba.pick_cg_iters(K, M),
                     float(np.sqrt(ba.CHI2_THRESHOLD)), 1e-4)

    # need >= 2 window frames for a meaningful solve; first group may have 1
    run = n_valid >= 2
    win_pose_cw = jnp.where(run & state.win_valid[:, None, None],
                            res.poses, state.win_pose_cw)
    pose_cw = win_pose_cw[last]
    pt_updated = run & ~points_fixed
    lm_pos = jnp.where(pt_updated[:, None], res.points, state.lm_pos)
    # re-express the anchored parametrization around the BA'd position so
    # subsequent per-frame depth refinement continues from it
    ray = lm_pos - state.lm_anchor_origin
    depth = jnp.linalg.norm(ray, axis=-1)
    ok = pt_updated & (depth > 1e-6)
    lm_depth = jnp.where(ok, depth, state.lm_depth)
    lm_anchor_ray = jnp.where(
        ok[:, None], ray / jnp.maximum(depth[:, None], 1e-9),
        state.lm_anchor_ray)
    # chi2 observation pruning (bundle_adjuster.cpp:376-388)
    chi2 = res.obs_chi2.reshape(M, K)
    wobs_valid = state.wobs_valid & jnp.where(
        run, chi2 <= ba.CHI2_THRESHOLD, True)
    return state._replace(
        pose_cw=jnp.where(run, pose_cw, state.pose_cw),
        prev_pose_cw=jnp.where(run, pose_cw, state.prev_pose_cw),
        win_pose_cw=win_pose_cw, lm_pos=lm_pos, lm_depth=lm_depth,
        lm_anchor_ray=lm_anchor_ray, wobs_valid=wobs_valid)


def _resolve_camera(cfg: DeviceVOConfig, camera):
    if camera is None:
        from slam_tpu.geometry.camera import PinholeCamera
        camera = PinholeCamera(fx=0.8 * cfg.width, fy=0.8 * cfg.width,
                               cx=cfg.width / 2.0, cy=cfg.height / 2.0,
                               width=cfg.width, height=cfg.height)
    return camera


def _resolve_settings(cfg: DeviceVOConfig,
                      settings: Optional[StaticSettings]) -> StaticSettings:
    if settings is None:
        settings = StaticSettings(Parameters(slam=ParametersSlam(
            maxKeypoints=cfg.max_keypoints)))
    return settings


def make_vo_step(cfg: DeviceVOConfig, camera=None,
                 settings: Optional[StaticSettings] = None):
    """Build the per-frame VO update `step(state, (image, odom_delta))`.

    ``odom_delta``: (4, 4) odometry motion prior, cam_t <- cam_{t-1}
    (the pose-seed delta chain of mapdb.cpp:52-79)."""
    settings = _resolve_settings(cfg, settings)
    spec = _frontend_spec(settings, cfg.width, cfg.height)
    camera = _resolve_camera(cfg, camera)
    cam_kind, cam_params_np = camera_jax.pack_camera(camera)
    cam_params = jnp.asarray(cam_params_np)
    focal = float(cam_params_np[0])
    n_tracked = 8
    loop_cb = (jnp.asarray(_loop_codebook(cfg.loop_words))
               if cfg.loop_every > 0 else None)

    def step(state: VOState, frame_in):
        image, odom_delta = frame_in
        txy = jnp.zeros((n_tracked, 2), jnp.float32)
        tvalid = jnp.zeros((n_tracked,), bool)
        pts, octv, ang, desc, feat_valid, _ = _extract_impl(
            image.astype(jnp.float32), txy, tvalid, spec)

        # full-f32 pose-chain product: at the TPU default precision this
        # 4x4 product rounds the translation at bf16 (~0.4%) EVERY frame,
        # a mm-to-cm random walk that compounds over the sequence
        with jax.default_matmul_precision("highest"):
            pose_pred = odom_delta @ state.pose_cw

        # --- projection matching + pose-only BA
        nn_mf, matched = _match_map(state, pts, desc, feat_valid, pose_pred,
                                    cam_kind, cam_params, cfg)
        mb = camera_jax.unproject(cam_kind, cam_params, pts[nn_mf])
        meas = mb[:, :2] / jnp.maximum(mb[:, 2:3], 1e-6)
        have_map = jnp.sum(matched) >= 6
        # fresh two-view landmarks carry large depth uncertainty (short
        # baseline); weight observations by landmark maturity so the pose is
        # not dragged by unconverged depths (the interactive pipeline's
        # equivalent guard is joint local BA + chi2 pruning)
        maturity = jnp.clip(
            (state.lm_n_obs.astype(jnp.float32) - 1.0) / cfg.maturity_ramp,
            cfg.maturity_floor, 1.0)
        pose_opt = _pose_ba(state, pose_pred, meas, matched, cfg,
                            focal * cfg.obs_weight_scale * maturity)
        pose_cw = jnp.where(have_map, pose_opt, pose_pred)

        # --- landmark bookkeeping (matched is indexed by landmark row)
        lm_last_seen = jnp.where(matched, state.frame_idx,
                                 state.lm_last_seen)
        # per-observation octave: the matched feature's pyramid level (feeds
        # the closure snapshot's levelSigmaSq, loop_ransac.cpp:28-40)
        lm_octave = jnp.where(matched, octv[nn_mf], state.lm_octave)
        feat_claimed = jnp.zeros(pts.shape[0], bool).at[nn_mf].max(matched)
        free_cur = feat_valid & ~feat_claimed

        # --- anchored-depth refinement from this frame's re-observations
        lm_pos, lm_depth, lm_n_obs = _refine_depths(state, pose_cw, meas,
                                                    matched, cfg)
        mid = state._replace(lm_pos=lm_pos, lm_depth=lm_depth,
                             lm_n_obs=lm_n_obs, lm_last_seen=lm_last_seen)

        (lm_pos, lm_desc, lm_valid, lm_last_seen, lm_anchor_origin,
         lm_anchor_ray, lm_depth, lm_n_obs, assigned, new_slot,
         new_meas_cur, new_meas_prev) = _create_landmarks(
            mid, pose_cw, pts, desc, free_cur, cam_kind, cam_params, cfg)
        n_new = jnp.sum(assigned)
        lm_octave = lm_octave.at[new_slot].set(octv, mode="drop")
        lm_created = state.lm_created.at[new_slot].set(state.frame_idx,
                                                       mode="drop")
        # creation-claimed features are no longer free: without this, a
        # feature whose fresh landmark misses next frame's projection match
        # would re-triangulate and mint a duplicate landmark (the reference
        # marks creation-claimed keypoints via their observation slot)
        free_cur = free_cur & ~assigned

        # --- staleness culling (cullMapPoints analogue)
        lm_valid = lm_valid & ((state.frame_idx - lm_last_seen)
                               <= cfg.stale_age)

        # --- sliding-window bookkeeping for the device-resident local BA
        win_pose_cw, win_valid, win_odo = (state.win_pose_cw,
                                           state.win_valid, state.win_odo)
        wobs_meas, wobs_valid = state.wobs_meas, state.wobs_valid
        if cfg.window > 0:
            K = cfg.window
            head = jnp.mod(state.frame_idx, K)
            prev_col = jnp.mod(state.frame_idx - 1, K)
            win_pose_cw = win_pose_cw.at[head].set(pose_cw)
            win_valid = win_valid.at[head].set(True)
            win_odo = win_odo.at[head].set(odom_delta)
            # the ring slot is recycled: clear its column, then record this
            # frame's re-observations (meas is per-landmark row)
            wobs_valid = wobs_valid.at[:, head].set(matched & lm_valid)
            wobs_meas = wobs_meas.at[:, head].set(meas)
            # fresh landmarks: clear any stale rows of the recycled slots,
            # then record both creation observations (cur + prev frame)
            wobs_valid = wobs_valid.at[new_slot, :].set(False, mode="drop")
            wobs_meas = wobs_meas.at[new_slot, head].set(new_meas_cur,
                                                         mode="drop")
            wobs_valid = wobs_valid.at[new_slot, head].set(True, mode="drop")
            wobs_meas = wobs_meas.at[new_slot, prev_col].set(new_meas_prev,
                                                             mode="drop")
            wobs_valid = wobs_valid.at[new_slot, prev_col].set(
                state.frame_idx > 0, mode="drop")

        # --- device-resident loop-candidate retrieval (BoW-index analogue)
        sig_ring, sig_frame = state.sig_ring, state.sig_frame
        sig_pc, sig_desc_ring = state.sig_pc, state.sig_desc
        sig_obs, sig_pvalid = state.sig_obs, state.sig_pvalid
        sig_pose, sig_octave = state.sig_pose, state.sig_octave
        loop_frame = jnp.asarray(-1, jnp.int32)
        loop_score = jnp.asarray(0.0, jnp.float32)
        if cfg.loop_every > 0:
            # quantize this frame's descriptors against the coarse trained
            # vocabulary: one (N, 256) x (256, W) int8 MXU GEMM + argmin
            words = jnp.argmin(hamming_matrix(desc, loop_cb), axis=1)
            hist = jnp.zeros(cfg.loop_words, jnp.float32).at[words].add(
                feat_valid.astype(jnp.float32))
            # sqrt damps word burstiness (repeated texture -> one hot word
            # dominating every frame's histogram and inflating all scores);
            # the host BowIndex gets the same effect from its much finer
            # 65,536-word quantization
            hist = jnp.sqrt(hist)
            sig = hist / jnp.maximum(jnp.linalg.norm(hist), 1e-6)
            # query the ring BEFORE storing: candidates must be at least
            # loop_min_gap frames old (too-close-in-time fast rejection,
            # loop_closer.cpp:164-187)
            scores = sig_ring @ sig
            eligible = ((sig_frame >= 0)
                        & (state.frame_idx - sig_frame >= cfg.loop_min_gap))
            ring_span = cfg.loop_slots * cfg.loop_every
            if ring_span > cfg.loop_stale_guard:
                # staleness guard (see DeviceVOConfig.loop_stale_guard):
                # never flag a candidate whose slot dies before the host's
                # one-chunk consumer lag elapses
                eligible &= (sig_frame
                             > state.frame_idx
                             - (ring_span - cfg.loop_stale_guard))
            scores = jnp.where(eligible, scores, -1.0)
            best = jnp.argmax(scores)
            loop_score = scores[best]
            loop_frame = jnp.where(loop_score >= cfg.loop_min_score,
                                   sig_frame[best], -1).astype(jnp.int32)
            # store at the static cadence (select, not cond: under vmap a
            # cond lowers to select anyway — the write is cheap)
            store = jnp.mod(state.frame_idx, cfg.loop_every) == 0
            slot = jnp.mod(state.frame_idx // cfg.loop_every, cfg.loop_slots)
            sig_ring = sig_ring.at[slot].set(
                jnp.where(store, sig, sig_ring[slot]))
            sig_frame = sig_frame.at[slot].set(
                jnp.where(store, state.frame_idx, sig_frame[slot]))
            # snapshot the frame's OBSERVED live landmarks for the host
            # closure stack: camera-frame points under the optimized pose,
            # descriptors, and normalized observations (what LoopRansac +
            # the Sim3 refinement consume — the analogue of the candidate
            # KF's observed map points, loop_ransac.cpp:8-45). ONLY rows
            # backed by THIS frame's image evidence qualify: landmarks
            # matched this frame (measured observation) or created this
            # frame (creation observation). Visible-but-unmatched rows are
            # deliberately excluded — their camera-frame coordinates are
            # pure map state, and on a persistent map they make a later
            # closure self-confirming (candToCurr degenerates to the poses'
            # own relative transform, carrying zero correction information).
            # Compaction = one argsort gather — no serial scatter.
            P = cfg.loop_points
            with jax.default_matmul_precision("highest"):
                pc_cam = lm_pos @ pose_cw[:3, :3].T + pose_cw[:3, 3]
            _, snap_vis = camera_jax.project(cam_kind, cam_params, pc_cam)
            created_now = jnp.zeros(lm_valid.shape[0], bool).at[
                new_slot].set(True, mode="drop")
            snap_sel = (lm_valid & snap_vis & (pc_cam[:, 2] > 1e-6)
                        & (matched | created_now))
            order = jnp.argsort(-snap_sel.astype(jnp.int32),
                                stable=True)[:P]
            zsafe = jnp.maximum(pc_cam[:, 2:3], 1e-6)
            obs_created = jnp.zeros_like(meas).at[new_slot].set(
                new_meas_cur, mode="drop")
            snap_obs = jnp.where((matched & snap_sel)[:, None], meas,
                                 jnp.where(created_now[:, None], obs_created,
                                           pc_cam[:, :2] / zsafe))
            sig_pc = sig_pc.at[slot].set(
                jnp.where(store, pc_cam[order], sig_pc[slot]))
            sig_desc_ring = sig_desc_ring.at[slot].set(
                jnp.where(store, lm_desc[order], sig_desc_ring[slot]))
            sig_obs = sig_obs.at[slot].set(
                jnp.where(store, snap_obs[order], sig_obs[slot]))
            sig_pvalid = sig_pvalid.at[slot].set(
                jnp.where(store, snap_sel[order], sig_pvalid[slot]))
            sig_pose = sig_pose.at[slot].set(
                jnp.where(store, pose_cw, sig_pose[slot]))
            sig_octave = sig_octave.at[slot].set(
                jnp.where(store, lm_octave[order], sig_octave[slot]))

        new_state = VOState(
            pose_cw=pose_cw, lm_pos=lm_pos, lm_desc=lm_desc,
            lm_valid=lm_valid, lm_last_seen=lm_last_seen,
            lm_anchor_origin=lm_anchor_origin, lm_anchor_ray=lm_anchor_ray,
            lm_depth=lm_depth, lm_n_obs=lm_n_obs,
            lm_octave=lm_octave, lm_created=lm_created,
            prev_pts=pts, prev_desc=desc, prev_free=free_cur,
            prev_pose_cw=pose_cw, frame_idx=state.frame_idx + 1,
            win_pose_cw=win_pose_cw, win_valid=win_valid, win_odo=win_odo,
            wobs_meas=wobs_meas, wobs_valid=wobs_valid,
            sig_ring=sig_ring, sig_frame=sig_frame,
            sig_pc=sig_pc, sig_desc=sig_desc_ring, sig_obs=sig_obs,
            sig_pvalid=sig_pvalid, sig_pose=sig_pose,
            sig_octave=sig_octave)
        return new_state, VOStepOut(pose_cw=pose_cw,
                                    n_matched=jnp.sum(matched),
                                    n_new=n_new,
                                    loop_frame=loop_frame,
                                    loop_score=loop_score)

    return step, spec


@functools.partial(jax.jit, static_argnames=("merge",))
def _rebase_states(state: VOState, T: jnp.ndarray, apply: jnp.ndarray,
                   cand_frame: jnp.ndarray,
                   cand_slot: Optional[jnp.ndarray] = None,
                   slot_T: Optional[jnp.ndarray] = None,
                   slot_frame: Optional[jnp.ndarray] = None,
                   merge_radius: float = 0.0,
                   merge: bool = False) -> VOState:
    """Apply per-sequence loop-closure corrections to batched device state —
    the device-path ``correctLoop`` (ONE dispatch for rebase + map hygiene).

    ``T``: (S, 4, 4) SE3 world->world correction, right-multiplied onto
    poses (reference correctLoop semantics, loop_closer.cpp:405-434:
    ``pose' = pose ∘ T`` with the Sim3 scale discarded by sim3ToSe3, which
    our host consumer mirrors via ``Sim3.to_se3``). CORRECTED-REGION
    landmarks — those created after the closure candidate
    (``lm_created > cand_frame``) — move by ``T⁻¹`` so their camera-frame
    coordinates are preserved exactly (``pose' p' = pose T T⁻¹ p``): the
    analogue of the map-point re-expression at loop_closer.cpp:492-506,
    which re-expresses only the corrected keyframes' points. Older
    landmarks stay put — they are the already-consistent old-region map
    the correction re-aligns the pose WITH; the next window BA then
    re-optimizes against them (the post-closure re-optimization of
    mapper_helpers.cpp:1106-1121, here the scan's scheduled window solve).

    ``slot_T``/``slot_frame``: (S, R, 4, 4)/(S, R) per-ring-slot correction
    matrices from the host consumer, carrying the same time-interpolated
    smear applied to the logged trajectory (loop_closer.cpp:421-470); a slot
    uses its custom matrix only when its stored frame still matches
    ``slot_frame`` (rows overwritten by in-flight chunks fall back to the
    rigid predicate ``sig_frame > cand_frame -> T``). Camera-frame snapshot
    points (sig_pc) are invariant under the rebase.

    ``merge=True`` additionally runs the post-closure duplicate-landmark
    hygiene (searchAndDeduplicate + map-point merge semantics,
    loop_closer.cpp:531-591): corrected-region landmarks are matched
    (Hamming mutual-NN + ``merge_radius`` 3D gate) first against surviving
    old-region landmarks — merging observation counts/window observations
    into the OLDER slot and freeing the duplicate — then against the
    accepted candidate snapshot's points, snapping their positions onto the
    old-lap geometry. ``apply``: (S,) mask — sequences without an accepted
    closure pass through untouched."""
    from slam_tpu.ops import lie

    S = T.shape[0]
    if cand_slot is None:
        cand_slot = jnp.zeros(S, jnp.int32)
    if slot_T is None:
        R_sig = state.sig_pose.shape[1]
        slot_T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                  (S, R_sig, 4, 4))
        slot_frame = jnp.full((S, R_sig), -2, jnp.int32)

    with jax.default_matmul_precision("highest"):
        def one(st, Tc, on, cf, cslot, sT, sF):
            Tinv = lie.se3_inverse(Tc)
            Rinv, tinv = Tinv[:3, :3], Tinv[:3, 3]
            corrected = st.lm_valid & (st.lm_created > cf)

            def pose(p):
                return jnp.where(on, p @ Tc, p)

            def point(p, move):
                return jnp.where(on & move[:, None], p @ Rinv.T + tinv, p)

            # per-slot snapshot-pose correction: host-provided interpolated
            # matrix when the slot's frame is the one the host mirrored,
            # else the rigid predicate (in-flight rows are always > cf)
            use_custom = st.sig_frame == sF
            rigid = jnp.where((st.sig_frame > cf)[:, None, None],
                              jnp.broadcast_to(Tc, st.sig_pose.shape),
                              jnp.broadcast_to(jnp.eye(4, dtype=Tc.dtype),
                                               st.sig_pose.shape))
            Tr = jnp.where(use_custom[:, None, None], sT, rigid)
            st = st._replace(
                pose_cw=pose(st.pose_cw),
                prev_pose_cw=pose(st.prev_pose_cw),
                win_pose_cw=jnp.where(on, st.win_pose_cw @ Tc,
                                      st.win_pose_cw),
                lm_pos=point(st.lm_pos, corrected),
                lm_anchor_origin=point(st.lm_anchor_origin, corrected),
                lm_anchor_ray=jnp.where((on & corrected)[:, None],
                                        st.lm_anchor_ray @ Rinv.T,
                                        st.lm_anchor_ray),
                sig_pose=jnp.where(on, st.sig_pose @ Tr, st.sig_pose))
            if not merge:
                return st
            return _merge_duplicates(st, on, cf, cslot,
                                     jnp.float32(merge_radius))

        return jax.vmap(one)(state, T, apply, cand_frame, cand_slot,
                             slot_T, slot_frame)


def _merge_duplicates(st: VOState, on, cf, cslot, radius):
    """Post-closure duplicate-landmark hygiene for ONE sequence (runs inside
    the vmapped rebase dispatch; see `_rebase_states`)."""
    M = st.lm_pos.shape[0]
    r2 = radius * radius
    new_mask = st.lm_valid & (st.lm_created > cf)
    old_mask = st.lm_valid & (st.lm_created <= cf) & (st.lm_created >= 0)

    # --- stage 1: merge corrected-region duplicates into surviving
    # old-region landmarks (map-point merge, loop_closer.cpp:531-546:
    # keep the older point, combine observations)
    dist = hamming_matrix(st.lm_desc, st.lm_desc)            # (M, M)
    d2 = jnp.sum((st.lm_pos[:, None, :] - st.lm_pos[None, :, :]) ** 2,
                 axis=-1)
    gate = new_mask[:, None] & old_mask[None, :] & (d2 <= r2)
    dist = jnp.where(gate, dist, jnp.int32(MASK_DIST))
    nn, ok = mutual_nn(dist, HAMMING_DIST_THR_LOW)
    ok = ok & on
    tgt = jnp.where(ok, nn, M)                               # OOB -> dropped
    lm_valid = st.lm_valid & ~ok
    lm_n_obs = st.lm_n_obs.at[tgt].add(
        jnp.where(ok, st.lm_n_obs, 0), mode="drop")
    lm_last_seen = st.lm_last_seen.at[tgt].max(
        jnp.where(ok, st.lm_last_seen, -1), mode="drop")
    # transfer window observations of the freed duplicate to the kept slot
    # (columns where the kept slot has none), then clear the freed rows
    add_valid = jnp.zeros_like(st.wobs_valid).at[tgt].max(
        st.wobs_valid & ok[:, None], mode="drop")
    add_meas = jnp.zeros_like(st.wobs_meas).at[tgt].add(
        jnp.where((st.wobs_valid & ok[:, None])[:, :, None],
                  st.wobs_meas, 0.0), mode="drop")
    take_new = add_valid & ~st.wobs_valid
    wobs_meas = jnp.where(take_new[:, :, None], add_meas, st.wobs_meas)
    wobs_valid = (st.wobs_valid | add_valid) & lm_valid[:, None]

    # --- stage 2: snap remaining corrected-region landmarks onto the
    # candidate snapshot's (old-lap) geometry — the candidate-neighborhood
    # dedup (loop_closer.cpp:567-591) for geometry whose live landmarks
    # were culled long ago but survive in the snapshot ring
    snap_pc = st.sig_pc[cslot]                               # (P, 3) cam
    snap_desc = st.sig_desc[cslot]
    snap_valid = st.sig_pvalid[cslot]
    pose_c = st.sig_pose[cslot]
    Rc, tc = pose_c[:3, :3], pose_c[:3, 3]
    p_w = (snap_pc - tc) @ Rc                                # R^T (p - t)
    dist2 = hamming_matrix(st.lm_desc, snap_desc)            # (M, P)
    d2s = jnp.sum((st.lm_pos[:, None, :] - p_w[None, :, :]) ** 2, axis=-1)
    gate2 = ((new_mask & lm_valid & ~ok)[:, None] & snap_valid[None, :]
             & (d2s <= r2))
    dist2 = jnp.where(gate2, dist2, jnp.int32(MASK_DIST))
    nn2, ok2 = mutual_nn(dist2, HAMMING_DIST_THR_LOW)
    ok2 = ok2 & on
    lm_pos = jnp.where(ok2[:, None], p_w[nn2], st.lm_pos)
    ray = lm_pos - st.lm_anchor_origin
    depth = jnp.linalg.norm(ray, axis=-1)
    upd = ok2 & (depth > 1e-6)
    lm_depth = jnp.where(upd, depth, st.lm_depth)
    lm_anchor_ray = jnp.where(upd[:, None],
                              ray / jnp.maximum(depth[:, None], 1e-9),
                              st.lm_anchor_ray)
    return st._replace(lm_valid=lm_valid, lm_n_obs=lm_n_obs,
                       lm_last_seen=lm_last_seen, lm_pos=lm_pos,
                       lm_depth=lm_depth, lm_anchor_ray=lm_anchor_ray,
                       wobs_meas=wobs_meas, wobs_valid=wobs_valid)


def loop_candidates(out: VOStepOut, frame_offset: int = 0) -> np.ndarray:
    """Flagged revisit pairs from one `advance` output.

    Returns (N, 4) int/float rows [sequence, query_frame, candidate_frame,
    score] for every frame whose in-scan retrieval reported a candidate
    (loop_frame >= 0). ``frame_offset`` = index of the chunk's first frame
    within the session (chunk c of length T -> c*T), applied to the query
    column only — ``loop_frame`` is already session-absolute (it comes from
    the state's signature ring). The host runs the geometric closure stack
    (loop_closer.py: matching -> Sim3 RANSAC -> refinement -> correct) on
    these pairs."""
    lf = np.asarray(out.loop_frame)
    ls = np.asarray(out.loop_score)
    if lf.ndim == 1:               # unbatched step output
        lf, ls = lf[None], ls[None]
    seq, t = np.nonzero(lf >= 0)
    return np.stack([seq.astype(np.float64), t + float(frame_offset),
                     lf[seq, t].astype(np.float64), ls[seq, t]], axis=1)


def init_state(cfg: DeviceVOConfig, num_slots: int,
               pose0_cw: Optional[np.ndarray] = None) -> VOState:
    M = cfg.lm_capacity
    if cfg.loop_every > 0:
        assert cfg.loop_points <= cfg.lm_capacity, (
            f"loop_points={cfg.loop_points} exceeds lm_capacity="
            f"{cfg.lm_capacity}: the snapshot compaction gathers at most "
            "lm_capacity landmark rows per ring slot")
    K_win = max(cfg.window, 1)
    R_sig = cfg.loop_slots if cfg.loop_every > 0 else 1
    W_sig = cfg.loop_words if cfg.loop_every > 0 else 1
    P_sig = cfg.loop_points if cfg.loop_every > 0 else 1
    pose0 = np.eye(4, dtype=np.float32) if pose0_cw is None else \
        np.asarray(pose0_cw, np.float32)
    return VOState(
        pose_cw=jnp.asarray(pose0),
        lm_pos=jnp.zeros((M, 3), jnp.float32),
        lm_desc=jnp.zeros((M, 8), jnp.uint32),
        lm_valid=jnp.zeros(M, bool),
        lm_last_seen=jnp.full(M, -1, jnp.int32),
        lm_anchor_origin=jnp.zeros((M, 3), jnp.float32),
        lm_anchor_ray=jnp.zeros((M, 3), jnp.float32),
        lm_depth=jnp.zeros(M, jnp.float32),
        lm_n_obs=jnp.zeros(M, jnp.int32),
        lm_octave=jnp.zeros(M, jnp.int32),
        lm_created=jnp.full(M, -1, jnp.int32),
        prev_pts=jnp.zeros((num_slots, 2), jnp.float32),
        prev_desc=jnp.zeros((num_slots, 8), jnp.uint32),
        prev_free=jnp.zeros(num_slots, bool),
        prev_pose_cw=jnp.asarray(pose0),
        frame_idx=jnp.asarray(0, jnp.int32),
        win_pose_cw=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (K_win, 4, 4)),
        win_valid=jnp.zeros(K_win, bool),
        win_odo=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 (K_win, 4, 4)),
        wobs_meas=jnp.zeros((M, K_win, 2), jnp.float32),
        wobs_valid=jnp.zeros((M, K_win), bool),
        sig_ring=jnp.zeros((R_sig, W_sig), jnp.float32),
        sig_frame=jnp.full(R_sig, -1, jnp.int32),
        sig_pc=jnp.zeros((R_sig, P_sig, 3), jnp.float32),
        sig_desc=jnp.zeros((R_sig, P_sig, 8), jnp.uint32),
        sig_obs=jnp.zeros((R_sig, P_sig, 2), jnp.float32),
        sig_pvalid=jnp.zeros((R_sig, P_sig), bool),
        sig_pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                  (R_sig, 4, 4)),
        sig_octave=jnp.zeros((R_sig, P_sig), jnp.int32))


# Compiled scan-over-frames programs keyed by everything that shapes the
# traced computation. Remote TPU compiles run ~30 s and jit caches per
# function *object*, so a fresh closure per BatchedDeviceVO instance would
# recompile an identical program every time a session is (re)created — the
# cache makes new instances free after the first (CLAUDE.md compile-leak
# rule; same role as matcher._bucket / bundle_adjustment._pad).
_CHUNK_CACHE: dict = {}


class BatchedDeviceVO:
    """S sequences x T frames per dispatch; state stays on device.

    `advance(images, odom_deltas)` consumes one (S, T, H, W) uint8 chunk and
    returns (S, T, 4, 4) poses + stats. Dispatches are asynchronous: chain
    several chunks before collecting to hide the tunnel round trip.

    Multi-chip: pass ``mesh`` (first axis = data axis) to shard the S
    sequences across devices. Per-sequence state and per-chunk inputs are
    placed with a batch-leading ``NamedSharding`` and GSPMD partitions the
    vmapped scan — sequences are independent, so no collectives are inserted
    and scaling is linear in chips (SURVEY.md §2: optional batch axis over
    the real workload)."""

    def __init__(self, cfg: DeviceVOConfig, batch: int, camera=None,
                 settings: Optional[StaticSettings] = None, mesh=None):
        self.cfg = cfg
        self.batch = batch
        self._sharding = None
        if mesh is not None:
            from slam_tpu.parallel.mesh import batch_sharding
            axis = mesh.axis_names[0]
            assert batch % mesh.shape[axis] == 0, (
                f"batch {batch} not divisible by mesh axis "
                f"'{axis}'={mesh.shape[axis]}")
            self._sharding = batch_sharding(mesh, axis)
        camera = _resolve_camera(cfg, camera)
        settings = _resolve_settings(cfg, settings)
        spec = _frontend_spec(settings, cfg.width, cfg.height)
        budgets = spec[1]
        self.num_slots = 8 + sum(budgets)

        if cfg.window:
            assert cfg.window >= 2, "window needs >= 2 frames"
            assert cfg.window_ba_every >= 1
        cam_kind, cam_params_np = camera_jax.pack_camera(camera)
        key = (cfg, spec, cam_kind,
               np.asarray(cam_params_np, np.float32).tobytes())
        fn = _CHUNK_CACHE.get(key)
        if fn is None:
            step, _ = make_vo_step(cfg, camera=camera, settings=settings)
            focal = float(cam_params_np[0])

            def _chunk_snaps(f0, st, T):
                """Ring rows stored during this chunk, gathered for the host
                mirror (see SnapOut). Stored frames are the multiples of
                loop_every in [f0, f0+T); with T % loop_every == 0 there are
                exactly T // loop_every of them regardless of alignment."""
                if cfg.loop_every <= 0:
                    return None
                le = cfg.loop_every
                assert T % le == 0, (
                    f"chunk length {T} not divisible by loop_every={le}: "
                    "the snapshot mirror needs a static stored-slot count")
                first = (f0 + le - 1) // le
                idx = first + jnp.arange(T // le, dtype=jnp.int32)
                slots = jnp.mod(idx, cfg.loop_slots)
                return SnapOut(slot=slots, frame=st.sig_frame[slots],
                               pc=st.sig_pc[slots], desc=st.sig_desc[slots],
                               obs=st.sig_obs[slots],
                               pvalid=st.sig_pvalid[slots],
                               pose=st.sig_pose[slots],
                               octave=st.sig_octave[slots])

            def chunk(state, images, odom_deltas):
                f0 = state.frame_idx
                T = images.shape[0]
                if cfg.window <= 0:
                    st, outs = jax.lax.scan(step, state, (images, odom_deltas))
                    return st, outs, _chunk_snaps(f0, st, T)
                # scan over frame GROUPS: `window_ba_every` pose-only frames,
                # then one device-resident window BA. The cadence must be a
                # static schedule — under vmap a traced lax.cond lowers to
                # select, which would execute the solve every frame.
                G = cfg.window_ba_every
                assert T % G == 0, (
                    f"chunk length {T} not divisible by window_ba_every={G}")

                def group(st, grp):
                    st, outs = jax.lax.scan(step, st, grp)
                    return _window_ba(st, cfg, focal), outs

                grp_in = jax.tree.map(
                    lambda x: x.reshape((T // G, G) + x.shape[1:]),
                    (images, odom_deltas))
                st, outs = jax.lax.scan(group, state, grp_in)
                outs = jax.tree.map(
                    lambda x: x.reshape((T,) + x.shape[2:]), outs)
                return st, outs, _chunk_snaps(f0, st, T)

            fn = jax.jit(jax.vmap(chunk))
            _CHUNK_CACHE[key] = fn
        self._chunk = fn
        self.reset()

    def reset(self, poses0_cw: Optional[np.ndarray] = None):
        """Re-initialize all sequence states (optionally at given (S, 4, 4)
        world->camera start poses) without touching the compiled program."""
        base = init_state(self.cfg, self.num_slots)
        self.state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.batch,) + x.shape), base)
        if poses0_cw is not None:
            p = jnp.asarray(poses0_cw, jnp.float32)
            self.state = self.state._replace(pose_cw=p, prev_pose_cw=p)
        if self._sharding is not None:
            # computation follows data: sharded state + inputs make jit
            # partition the whole scan over the mesh, no in_shardings needed
            self.state = jax.device_put(self.state, self._sharding)
        self.last_snaps = None

    def _put(self, x):
        if self._sharding is not None:
            return jax.device_put(np.asarray(x), self._sharding)
        return jnp.asarray(x)

    def advance(self, images: np.ndarray, odom_deltas: np.ndarray):
        """images: (S, T, H, W); odom_deltas: (S, T, 4, 4).

        When loop detection is on, the ring rows stored during the chunk are
        additionally exposed as ``self.last_snaps`` (SnapOut batched over S)
        for the host snapshot mirror (pipeline/device_slam.py)."""
        self.state, out, self.last_snaps = self._chunk(
            self.state, self._put(images), self._put(odom_deltas))
        return out

    def save_state(self, path: str) -> None:
        """Checkpoint the device-resident session state to an ``.npz``
        (map save analogue, mapper.cpp:504-512, for the serving path; the
        compiled program is NOT part of the checkpoint — a fresh session
        reuses the module-level program cache)."""
        host = jax.device_get(self.state)
        np.savez_compressed(path, **{f: np.asarray(v)
                                     for f, v in zip(VOState._fields, host)})

    def load_state(self, path: str) -> None:
        """Resume a session from :meth:`save_state` output. The checkpoint
        must match this instance's (cfg, batch) capacities."""
        with np.load(path) as z:
            leaves = [z[f] for f in VOState._fields]
        for cur, new, name in zip(jax.tree.leaves(self.state), leaves,
                                  VOState._fields):
            assert tuple(cur.shape) == tuple(new.shape), (
                f"checkpoint field {name}: shape {new.shape} != "
                f"session capacity {cur.shape}")
        state = VOState(*leaves)
        if self._sharding is not None:
            state = jax.device_put(state, self._sharding)
        else:
            state = jax.tree.map(jnp.asarray, state)
        self.state = state
