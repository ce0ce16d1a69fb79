"""Device-SLAM: the device-resident backend plus the host loop-closure
consumer — the serving path's full SLAM loop.

`BatchedDeviceVO` runs VO + sliding-window local BA + loop-candidate
retrieval entirely inside one jitted scan per chunk (pipeline/device_vo.py).
This module closes the loop — literally: it consumes the per-frame
``(loop_frame, loop_score)`` flags plus the closure snapshot ring
(camera-frame landmark points, descriptors, observations, poses stored at
the retrieval cadence) and runs the reference's geometric closure stack on
flagged pairs:

    descriptor matching (mutual-NN + Lowe ratio; matchForLoopClosures
    semantics, keyframe_matcher.cpp:50-158, minus the BoW buckets and
    orientation vote the snapshot ring does not carry)
 -> Sim3 RANSAC over camera-frame point pairs (loop_ransac.cpp:47-110,
    `ops/ransac.sim3_ransac_host`, per-octave levelSigmaSq chi2 gates)
 -> Sim3 refinement (optimize_transform.cpp:63-155,
    `sim3_opt.optimize_sim3_transform_host`)
 -> acceptance gates (loop_closer.cpp:280-338: unnecessary-correction and
    drift-rate gates over time and distance traveled)
 -> correction (loop_closer.cpp:380-561: correction transform
    T = poseCW⁻¹ ∘ candToCurr ∘ candidatePoseCW with the Sim3 scale
    discarded by sim3ToSe3): the logged trajectory gets the rigid +
    time-interpolated smear, and the DEVICE STATE is rebased — including
    the post-closure duplicate-landmark merge/dedup of
    loop_closer.cpp:492-591 — in ONE dispatch
    (`device_vo._rebase_states`) so the in-flight map, pose ring and
    window continue from the corrected frame.

The consumer is TUNNEL-FREE by design: snapshot-ring rows ride the
per-chunk fused transfer into a host mirror (`_mirror_snaps`), and the
matching/RANSAC/refinement stack runs on host NumPy (the problems are a
few hundred points — a device dispatch would trade microseconds of compute
for a ~26 ms round trip per attempt). The only device interaction of a
closure is the single async rebase dispatch.

Chunks stay asynchronous: `advance` dispatches the next chunk before the
previous chunk's flags are collected, so closure consumption overlaps the
device work and corrections land one chunk late (bounded lag, measured per
accepted closure in ``closure_lags`` — the reference's backend similarly
lags the frontend by ``backendProcessDelay`` frames, mapper.cpp:239-266).
"""
from __future__ import annotations

from collections import deque
from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from slam_tpu.geometry import se3
from slam_tpu.native import hamming_matrix as hamming_matrix_native
from slam_tpu.ops.hamming import HAMMING_DIST_THR_LOW
from slam_tpu.ops.ransac import sim3_ransac_host
from slam_tpu.ops.sim3_opt import optimize_sim3_transform_host
from slam_tpu.pipeline.device_vo import (BatchedDeviceVO, DeviceVOConfig,
                                         _rebase_states, _resolve_settings,
                                         loop_candidates)
from slam_tpu.pipeline.loop_closer import drift_gate_angle


class DeviceSlamParams(NamedTuple):
    """Host closure-stack knobs; defaults mirror `params.ParametersSlam`."""
    frame_dt: float = 0.05            # seconds per frame (camera rate)
    lowe_ratio: float = 0.9           # loopClosureFeatureMatchLoweRatio
    min_feature_matches: int = 20     # minLoopClosureFeatureMatches
    ransac_iterations: int = 200      # loopClosureRansacIterations
    ransac_min_inliers: int = 20      # loopClosureRansacMinInliers
    fix_scale: bool = True            # loopClosureRansacFixScale
    inlier_threshold: float = 10.0    # loopClosureInlierThreshold
    min_closure_gap_s: float = 5.0    # correction >= 5 s gate,
    #                                   loop_closer.cpp:166-169
    # retrieval score gate, applied HOST-side so it needs no recompile of
    # the scanned program (the device-side cfg.loop_min_score stays 0 =
    # report-everything). None = AUTO-CALIBRATE from the bootstrap segment:
    # the first `calib_frames` frames are assumed revisit-free (their
    # eligible-candidate scores are cross-scene similarity, i.e. the false-
    # positive distribution), and the gate is their max + `calib_margin`,
    # clamped to [calib_floor, 0.995]. The bowScoreRatio analogue of
    # bow_index.cpp:95-176, made safe-by-measurement instead of by-tuning.
    min_loop_score: Optional[float] = None
    calib_frames: int = 60
    calib_margin: float = 0.02
    calib_floor: float = 0.5
    max_drift_m_per_s: float = 0.05   # maximumDriftMetersPerSecond
    max_drift_m_per_m: float = 0.05   # maximumDriftMetersPerTraveled
    max_drift_rad_per_s: float = 0.01  # maximumDriftRadiansPerSecond
    max_drift_rad_per_m: float = 0.01  # maximumDriftRadiansPerTraveled
    apply_closures: bool = True       # applyLoopClosures
    # post-closure map hygiene (searchAndDeduplicate + map-point merge,
    # loop_closer.cpp:531-591): merge corrected-region duplicate landmarks
    # into surviving old-region ones / snap them onto the candidate
    # snapshot's geometry, inside the same rebase dispatch. The 3D merge
    # radius replaces the reference's pixel-projection search radius
    # (docs/ARCHITECTURE.md: the device map is a world-frame point store,
    # so the natural dedup gate is metric; the Hamming mutual-NN gate does
    # the discriminative work either way).
    merge_landmarks: bool = True
    merge_radius_m: float = 0.3


def calibrate_loop_gate(bootstrap_scores: np.ndarray, margin: float = 0.02,
                        floor: float = 0.5, ceil: float = 0.995) -> float:
    """Retrieval-score gate from a revisit-free bootstrap segment.

    ``bootstrap_scores``: per-frame best-eligible-candidate cosine scores
    (``VOStepOut.loop_score``; entries <= -0.5 mean no eligible candidate
    and are ignored). The returned gate sits ``margin`` above the largest
    observed false-positive score — scores above it are then evidence of a
    genuine revisit on this texture regime. Standalone version of the
    auto-calibration `DeviceSlam` runs when ``min_loop_score`` is None."""
    s = np.asarray(bootstrap_scores, np.float64).ravel()
    s = s[s > -0.5]
    base = float(s.max()) if len(s) else floor
    return float(np.clip(base + margin, floor, ceil))


class ClosureEvent(NamedTuple):
    seq: int
    query_frame: int
    cand_frame: int
    score: float
    n_matches: int
    n_inliers: int
    accepted: bool
    reason: str                        # LoopCloserStats-style outcome tag
    T: Optional[np.ndarray]            # (4, 4) world correction when accepted


def _mutual_nn_lowe(dist: np.ndarray, valid1: np.ndarray,
                    valid2: np.ndarray, lowe_ratio: float):
    """Mutual-nearest matching with Lowe second-best ratio and THR_LOW
    acceptance over a host Hamming matrix. Returns (idx1, idx2) pairs."""
    d = dist.astype(np.int64).copy()
    BIG = 10_000
    d[~valid1, :] = BIG
    d[:, ~valid2] = BIG
    if d.shape[1] < 2:
        return np.zeros(0, int), np.zeros(0, int)
    best2 = np.argmin(d, axis=1)
    part = np.partition(d, 1, axis=1)
    best_d, second_d = part[:, 0], part[:, 1]
    best1_of_2 = np.argmin(d, axis=0)
    i1 = np.arange(d.shape[0])
    ok = (valid1
          & (best_d <= HAMMING_DIST_THR_LOW)
          & (best_d <= lowe_ratio * second_d)
          & (best1_of_2[best2] == i1))
    return i1[ok], best2[ok]


class DeviceSlam:
    """S concurrent device-resident SLAM sessions with host loop closure.

    Parameters
    ----------
    cfg : DeviceVOConfig with ``loop_every > 0`` (and usually ``window > 0``
        for the in-scan local BA) — the full device backend.
    batch : number of concurrent sequences S.
    """

    def __init__(self, cfg: DeviceVOConfig, batch: int, camera=None,
                 settings=None, mesh=None,
                 params: DeviceSlamParams = DeviceSlamParams()):
        assert cfg.loop_every > 0, (
            "DeviceSlam needs in-scan loop-candidate retrieval "
            "(cfg.loop_every > 0)")
        from slam_tpu.pipeline.device_vo import _resolve_camera
        self.cfg = cfg
        self.batch = batch
        self.params = params
        self.camera = _resolve_camera(cfg, camera)
        self.vo = BatchedDeviceVO(cfg, batch=batch, camera=self.camera,
                                  settings=settings, mesh=mesh)
        # per-observation chi2/weight scaling for the closure stack
        # (levelSigmaSq, loop_ransac.cpp:28-40) from the snapshot octaves
        self._level_sigma_sq = np.asarray(
            _resolve_settings(cfg, settings).levelSigmaSq, np.float64)
        self._pose_log: List[List[np.ndarray]] = [[] for _ in range(batch)]
        self._last_closure = [-(10 ** 9)] * batch
        self.closures: List[ClosureEvent] = []
        self.closure_lags: List[int] = []   # frames between flagged query
        #                                     and applied rebase (the
        #                                     one-chunk consumer lag,
        #                                     measured per accepted closure)
        self._pending: deque = deque()
        self._frames_done = 0
        # host-side retrieval gate (see DeviceSlamParams.min_loop_score)
        self._calib_scores: List[List[float]] = [[] for _ in range(batch)]
        self._score_gate: List[Optional[float]] = [
            params.min_loop_score] * batch
        # host MIRROR of the device snapshot ring: filled from the per-chunk
        # SnapOut rows riding the fused transfer, so closure attempts read
        # snapshots with ZERO dedicated device round trips
        S, R, P = batch, cfg.loop_slots, cfg.loop_points
        self._ring_frame = np.full((S, R), -1, np.int64)
        self._ring_pc = np.zeros((S, R, P, 3), np.float32)
        self._ring_desc = np.zeros((S, R, P, 8), np.uint32)
        self._ring_obs = np.zeros((S, R, P, 2), np.float32)
        self._ring_pvalid = np.zeros((S, R, P), bool)
        self._ring_pose = np.broadcast_to(
            np.eye(4, dtype=np.float32), (S, R, 4, 4)).copy()
        self._ring_octave = np.zeros((S, R, P), np.int32)

    # ------------------------------------------------------------------

    def advance(self, images: np.ndarray, odom_deltas: np.ndarray):
        """Dispatch one (S, T, ...) chunk; consume the PREVIOUS chunk's
        loop flags while this one runs on device (one-chunk closure lag)."""
        out = self.vo.advance(images, odom_deltas)
        snaps = self.vo.last_snaps
        for leaf in ((out.pose_cw, out.loop_frame, out.loop_score)
                     + tuple(snaps)):
            leaf.copy_to_host_async()
        # fourth slot: per-sequence corrections accepted AFTER this chunk
        # was dispatched but BEFORE it is consumed — its poses were computed
        # from pre-rebase state and must be corrected on arrival
        self._pending.append([out, snaps, self._frames_done, {}])
        self._frames_done += images.shape[1]
        while len(self._pending) > 1:
            self._consume(*self._pending.popleft())
        return out

    def finish(self) -> None:
        """Drain pending chunks (forces completion of the dispatch chain)."""
        while self._pending:
            self._consume(*self._pending.popleft())

    def trajectory(self, seq: int) -> np.ndarray:
        """(F, 4, 4) loop-corrected pose_cw log of one sequence."""
        return np.stack(self._pose_log[seq]) if self._pose_log[seq] else \
            np.zeros((0, 4, 4), np.float32)

    # ------------------------------------------------------------------

    def _consume(self, out, snaps, offset: int, late_corr: dict) -> None:
        # ONE transfer for everything this chunk needs on host — poses,
        # flags AND the snapshot-ring rows stored during the chunk (each
        # separate device_get costs a full tunnel round trip)
        poses, loop_frame, loop_score, snaps = jax.device_get(
            (out.pose_cw, out.loop_frame, out.loop_score, snaps))
        poses = np.asarray(poses)                            # (S, T, 4, 4)
        out = out._replace(pose_cw=poses, loop_frame=np.asarray(loop_frame),
                           loop_score=np.asarray(loop_score))
        for s in range(self.batch):
            Tc = late_corr.get(s)
            if Tc is not None:
                self._pose_log[s].extend(p @ Tc for p in poses[s])
            else:
                self._pose_log[s].extend(poses[s])
        self._mirror_snaps(snaps, late_corr)
        # score-gate calibration from the bootstrap segment (assumed
        # revisit-free), then finalize once the segment is past
        p = self.params
        if p.min_loop_score is None:
            scores = np.asarray(out.loop_score)              # (S, T), host
            T = scores.shape[1]
            for s in range(self.batch):
                if self._score_gate[s] is not None:
                    continue
                hi = min(p.calib_frames - offset, T)
                if hi > 0:
                    self._calib_scores[s].extend(scores[s, :hi].tolist())
                if offset + T >= p.calib_frames:
                    self._score_gate[s] = calibrate_loop_gate(
                        np.asarray(self._calib_scores[s]),
                        p.calib_margin, p.calib_floor)

        rows = loop_candidates(out, frame_offset=offset)
        if len(rows) == 0:
            return
        gap_frames = p.min_closure_gap_s / p.frame_dt
        best = {}
        for seq_f, q_f, c_f, score in rows:
            seq, q, c = int(seq_f), int(q_f), int(c_f)
            # only snapshot-stored queries carry closure geometry
            if q % self.cfg.loop_every != 0:
                continue
            if q - self._last_closure[seq] < gap_frames:
                continue
            gate = self._score_gate[seq]
            if gate is None or score < gate:
                continue
            cur = best.get(seq)
            if cur is None or score > cur[2]:
                best[seq] = (q, c, float(score))
        if not best:
            return
        Ts = np.tile(np.eye(4, dtype=np.float32), (self.batch, 1, 1))
        apply = np.zeros(self.batch, bool)
        cands = np.full(self.batch, -1, np.int32)
        R = self.cfg.loop_slots
        cand_slots = np.zeros(self.batch, np.int32)
        slot_T = np.tile(np.eye(4, dtype=np.float32), (self.batch, R, 1, 1))
        slot_frame = np.full((self.batch, R), -2, np.int32)
        for seq, (q, c, score) in best.items():
            ev = self._try_close(seq, q, c, score)
            self.closures.append(ev)
            if ev.accepted and self.params.apply_closures:
                Ts[seq] = ev.T
                apply[seq] = True
                cands[seq] = c
                cand_slots[seq] = (c // self.cfg.loop_every) % R
                self._slot_corrections(seq, c, q, ev.T, slot_T, slot_frame)
                self._correct_log(seq, c, q, ev.T)
                self._last_closure[seq] = q
                self.closure_lags.append(self._frames_done - q)
        if apply.any():
            self.vo.state = _rebase_states(
                self.vo.state, jnp.asarray(Ts), jnp.asarray(apply),
                jnp.asarray(cands), jnp.asarray(cand_slots),
                jnp.asarray(slot_T), jnp.asarray(slot_frame),
                merge_radius=float(self.params.merge_radius_m),
                merge=bool(self.params.merge_landmarks))
            # chunks still in flight were computed from pre-rebase state:
            # their poses get the same right-multiplied correction when
            # they arrive (reference analogue: frames queued behind the
            # backend during correctLoop replay onto the corrected map,
            # mapper.cpp:328-343 fastForward)
            for entry in self._pending:
                for s in np.nonzero(apply)[0]:
                    prev = entry[3].get(int(s), np.eye(4, dtype=np.float32))
                    entry[3][int(s)] = prev @ Ts[s]

    # ------------------------------------------------------------------

    def _mirror_snaps(self, snaps, late_corr: dict) -> None:
        """Fold one chunk's SnapOut rows into the host ring mirror. Rows of
        a chunk that was in flight when a rebase landed were computed from
        pre-rebase state: their poses get the pending correction (their
        frames are all past the closure query, so the full rigid ``T``);
        camera-frame points are invariant."""
        slot = np.asarray(snaps.slot)                     # (S, C)
        frame = np.asarray(snaps.frame)
        pc = np.asarray(snaps.pc)
        desc = np.asarray(snaps.desc)
        obs = np.asarray(snaps.obs)
        pvalid = np.asarray(snaps.pvalid)
        pose = np.asarray(snaps.pose)
        octave = np.asarray(snaps.octave)
        for s in range(self.batch):
            Tc = late_corr.get(s)
            sl = slot[s]
            self._ring_frame[s, sl] = frame[s]
            self._ring_pc[s, sl] = pc[s]
            self._ring_desc[s, sl] = desc[s]
            self._ring_obs[s, sl] = obs[s]
            self._ring_pvalid[s, sl] = pvalid[s]
            self._ring_pose[s, sl] = pose[s] if Tc is None else pose[s] @ Tc
            self._ring_octave[s, sl] = octave[s]

    def _slot_corrections(self, seq: int, c: int, q: int, T: np.ndarray,
                          slot_T: np.ndarray, slot_frame: np.ndarray) -> None:
        """Per-ring-slot correction matrices matching `_correct_log`'s
        time-interpolated smear (loop_closer.cpp:421-470), filled for every
        slot the mirror knows and applied to the mirror poses; the device
        rebase applies the identical matrices to its sig_pose rows (falling
        back to the rigid predicate for rows overwritten in flight)."""
        start = max(c, self._last_closure[seq] + 1, 0)
        T1 = se3.Sim3.from_se3(np.asarray(T, np.float64))
        T0 = se3.Sim3.identity()
        for r in range(self.cfg.loop_slots):
            f = int(self._ring_frame[seq, r])
            if f < 0:
                continue
            if f >= q:
                Tl = np.asarray(T, np.float64)
            elif f <= start:
                Tl = np.eye(4)
            else:
                lam = (f - start) / max(q - start, 1)
                Tl = se3.interpolate_sim3(
                    T0, T1, min(max(lam, 0.0), 1.0)).to_se3()
            slot_T[seq, r] = Tl.astype(np.float32)
            slot_frame[seq, r] = f
            self._ring_pose[seq, r] = (
                self._ring_pose[seq, r].astype(np.float64) @ Tl
            ).astype(np.float32)

    def _snapshots(self, seq: int, frame_q: int, frame_c: int):
        """Both closure snapshots, read from the host ring mirror (zero
        device round trips — the rows rode the per-chunk fused transfer)."""
        rows = []
        for frame in (frame_q, frame_c):
            slot = (frame // self.cfg.loop_every) % self.cfg.loop_slots
            rows.append((self._ring_frame[seq, slot],
                         self._ring_pc[seq, slot],
                         self._ring_desc[seq, slot],
                         self._ring_obs[seq, slot],
                         self._ring_pvalid[seq, slot],
                         self._ring_pose[seq, slot],
                         self._ring_octave[seq, slot]))
        return rows[0], rows[1]

    def _try_close(self, seq: int, q: int, c: int,
                   score: float) -> ClosureEvent:
        p = self.params

        def rej(reason, n_matches=0, n_inliers=0):
            return ClosureEvent(seq, q, c, score, n_matches, n_inliers,
                                False, reason, None)

        ((fq, pc_q, desc_q, obs_q, val_q, pose_q, oct_q),
         (fc, pc_c, desc_c, obs_c, val_c, pose_c, oct_c)) = \
            self._snapshots(seq, q, c)
        if int(fq) != q or int(fc) != c:
            return rej("ring_overwritten")

        # native popcount GEMM (NumPy table-lookup fallback inside): the
        # 192x192 host matrix costs ~9 ms in NumPy vs ~0.2 ms native —
        # per-attempt host cost is serving-path budget on the 1-core host
        dist = hamming_matrix_native(desc_q, desc_c)
        i_q, i_c = _mutual_nn_lowe(dist, val_q, val_c, p.lowe_ratio)
        if len(i_q) < p.min_feature_matches:
            return rej("too_few_feature_matches", n_matches=len(i_q))

        # Sim3 RANSAC over camera-frame point pairs: "1" = query/current,
        # "2" = candidate, so the recovered transform12 is candToCurr —
        # the same convention as the interactive LoopCloser (loop RANSAC
        # ctor loop_ransac.cpp:8-45). Per-match chi2 gates and refinement
        # weights scale with the snapshot keypoints' levelSigmaSq
        # (loop_ransac.cpp:28-40). The whole geometric stack runs on host
        # NumPy: the problem is ~200 hypotheses x ~200 points, and a device
        # dispatch would cost a ~26 ms tunnel round trip per closure
        # attempt to save microseconds of compute.
        lv = self._level_sigma_sq
        sig_q = lv[np.clip(oct_q[i_q], 0, len(lv) - 1)]
        sig_c = lv[np.clip(oct_c[i_c], 0, len(lv) - 1)]
        res = sim3_ransac_host(self.camera, self.camera,
                               pc_q[i_q], pc_c[i_c], sig_q, sig_c,
                               p.ransac_iterations, dof="SIM3",
                               fix_scale=p.fix_scale,
                               min_inliers=p.ransac_min_inliers)
        if not res.ok:
            return rej("ransac_failed", n_matches=len(i_q))

        inl = res.inliers
        R12, t12, s12 = optimize_sim3_transform_host(
            res.rot_12, res.trans_12, res.scale_12,
            pc_q[i_q][inl], pc_c[i_c][inl],
            obs_q[i_q][inl], obs_c[i_c][inl],
            sig_q[inl], sig_c[inl],
            p.inlier_threshold, p.fix_scale)
        cand_to_curr = se3.Sim3(R12, t12, s12)

        # acceptance gates (loop_closer.cpp:280-338)
        updated_pose = (cand_to_curr * se3.Sim3.from_se3(pose_c)).to_se3()
        correction_distance = float(np.linalg.norm(
            se3.camera_center(pose_q) - se3.camera_center(updated_pose)))
        distance_from_candidate = float(np.linalg.norm(
            se3.camera_center(pose_c) - se3.camera_center(updated_pose)))
        if distance_from_candidate > 1.0 * correction_distance:
            return rej("unnecessary", len(i_q), res.num_inliers)
        angle_change = drift_gate_angle(cand_to_curr.to_se3(), pose_c,
                                        pose_q)
        time_between = max((q - c) * p.frame_dt, 1e-9)
        log = self._pose_log[seq]
        centers = np.stack([se3.camera_center(log[f])
                            for f in range(c, min(q + 1, len(log)))])
        traveled = float(np.sum(np.linalg.norm(np.diff(centers, axis=0),
                                               axis=1))) if len(centers) > 1 \
            else 1e-9
        if (correction_distance / time_between > p.max_drift_m_per_s
                or correction_distance / max(traveled, 1e-9)
                > p.max_drift_m_per_m):
            return rej("too_large_position_drift", len(i_q), res.num_inliers)
        if (angle_change / time_between > p.max_drift_rad_per_s
                or angle_change / max(traveled, 1e-9) > p.max_drift_rad_per_m):
            return rej("too_large_angle_drift", len(i_q), res.num_inliers)

        # correction transform (loop_closer.cpp:405; scale discarded by
        # sim3ToSe3 exactly as the interactive correct_loop does)
        T = (se3.Sim3.from_se3(pose_q).inverse() * cand_to_curr
             * se3.Sim3.from_se3(pose_c)).to_se3().astype(np.float32)
        return ClosureEvent(seq, q, c, score, len(i_q), res.num_inliers,
                            True, "ok", T)

    def _correct_log(self, seq: int, c: int, q: int, T: np.ndarray) -> None:
        """Rigid + time-interpolated smear of the correction over the logged
        trajectory (loop_closer.cpp:421-470): frames at/after the query move
        rigidly by ``T``; frames between the correction start (candidate or
        previous closure, whichever is newer) and the query interpolate
        between identity and ``T``."""
        log = self._pose_log[seq]
        start = max(c, self._last_closure[seq] + 1, 0)
        T1 = se3.Sim3.from_se3(T.astype(np.float64))
        T0 = se3.Sim3.identity()
        for f in range(start, len(log)):
            if f >= q:
                Tl = T1
            else:
                lam = (f - start) / max(q - start, 1)
                Tl = se3.interpolate_sim3(T0, T1, min(max(lam, 0.0), 1.0))
            log[f] = (se3.Sim3.from_se3(log[f].astype(np.float64))
                      * Tl).to_se3().astype(np.float32)
