"""Synthetic SLAM world for integration tests.

Known poses + synthetic landmarks with stable random descriptors; a fake
front-end "detects" their projections. This exercises the whole backend
pipeline (association, triangulation, BA, culling, retrieval, loop closure)
with controllable geometry — the integration-test strategy called for in
SURVEY.md §4.
"""
import dataclasses
from typing import List, Optional

import numpy as np

from slam_tpu.geometry import se3
from slam_tpu.geometry.camera import default_camera
from slam_tpu.map.keyframe import MapperInput, Pose
from slam_tpu.ops.frontend import FrontendResult


@dataclasses.dataclass
class SyntheticWorld:
    landmarks: np.ndarray          # (L, 3)
    descriptors: np.ndarray        # (L, 8) uint32
    poses_cw: List[np.ndarray]     # per frame
    times: List[float]
    camera: object
    odometry_cw: List[np.ndarray]  # odometry (noisy) poses per frame


def make_world(n_frames=40, n_landmarks=400, seed=0, trajectory="line",
               odom_noise=0.0, odom_drift=0.0, fps=10.0, camera=None,
               lap_frames=None):
    rng = np.random.default_rng(seed)
    camera = camera or default_camera(640, 480)

    if trajectory == "line":
        centers = [np.array([0.12 * i, 0.0, 0.0]) for i in range(n_frames)]
        yaws = [0.0] * n_frames
        lows, highs = [-2, -2, 2.0], [0.12 * n_frames + 2, 2, 8.0]
    elif trajectory == "loop":
        # square loop in the x-z plane; frames beyond one lap (lap_frames)
        # revisit the start of the loop with identical poses
        per_side = (lap_frames or n_frames) // 4
        centers, yaws = [], []
        side_len = 0.15 * per_side
        heading = [0.0, np.pi / 2, np.pi, 3 * np.pi / 2]
        corners = [np.array([0.0, 0.0, 0.0]),
                   np.array([side_len, 0.0, 0.0]),
                   np.array([side_len, 0.0, side_len]),
                   np.array([0.0, 0.0, side_len])]
        for i in range(n_frames):
            j = i % (4 * per_side)  # wrap: frames past one lap revisit the start
            side = j // per_side
            frac = (j - side * per_side) / per_side
            d = heading[side]
            step = np.array([np.cos(d), 0.0, np.sin(d)]) * side_len * frac
            centers.append(corners[side] + step)
            yaws.append(d)
        lows, highs = [-4, -2, -4], [side_len + 4, 2, side_len + 4]
    else:
        raise ValueError(trajectory)

    landmarks = rng.uniform(lows, highs, (n_landmarks, 3))
    descriptors = rng.integers(0, 2 ** 32, (n_landmarks, 8), dtype=np.uint32)

    poses_cw = []
    for c, yaw in zip(centers, yaws):
        # camera looks along +z rotated by yaw about y
        R_wc = se3.so3_exp(np.array([0.0, yaw, 0.0]))
        R_cw = R_wc.T
        T = np.eye(4)
        T[:3, :3] = R_cw
        T[:3, 3] = -R_cw @ c
        poses_cw.append(T)

    # odometry: true pose perturbed by noise and accumulating drift
    odometry_cw = []
    drift = np.zeros(3)
    for i, T in enumerate(poses_cw):
        drift = drift + rng.normal(0, odom_drift, 3)
        xi = np.concatenate([rng.normal(0, odom_noise, 3),
                             rng.normal(0, odom_noise, 3) + drift])
        odometry_cw.append(se3.se3_exp(xi) @ T)

    times = [i / fps for i in range(n_frames)]
    return SyntheticWorld(landmarks, descriptors, poses_cw, times, camera,
                          odometry_cw)


def visible_landmarks(world: SyntheticWorld, frame: int, margin=20.0):
    T = world.poses_cw[frame]
    pc = world.landmarks @ T[:3, :3].T + T[:3, 3]
    pix, ok = world.camera.ray_to_pixel(pc)
    ok = ok & world.camera.is_valid_pixel(pix, margin=margin) & (pc[:, 2] > 0.5)
    return np.where(ok)[0], pix


class TrackSimulator:
    """Simulated LK tracker: persistent tracks on a subset of landmarks.

    Like a real LK tracker, a landmark that leaves the view and is later
    re-acquired gets a FRESH track id (no re-identification) — loop closures
    must come from appearance, not track ids.
    """

    def __init__(self, world: SyntheticWorld, max_tracks=60, seed=2):
        self.world = world
        self.max_tracks = max_tracks
        self.rng = np.random.default_rng(seed)
        self.active: dict = {}           # track_id -> landmark index
        self.track_to_landmark: dict = {}  # all-time mapping
        self._next_id = 0

    def tracks_for_frame(self, frame: int):
        vis, pix = visible_landmarks(self.world, frame)
        vis_set = set(int(v) for v in vis)
        self.active = {t: li for t, li in self.active.items() if li in vis_set}
        tracked_landmarks = set(self.active.values())
        for li in vis:
            if len(self.active) >= self.max_tracks:
                break
            if int(li) not in tracked_landmarks:
                tid = self._next_id
                self._next_id += 1
                self.active[tid] = int(li)
                self.track_to_landmark[tid] = int(li)
                tracked_landmarks.add(int(li))
        ids = np.array(sorted(self.active), np.int64)
        lms = np.array([self.active[int(t)] for t in ids], np.int64)
        pts = pix[lms].astype(np.float32)
        return ids, pts

    def landmarks_of(self, ids) -> np.ndarray:
        return np.array([self.track_to_landmark[int(t)] for t in ids], np.int64)


class FakeOrbExtractor:
    """Front-end stub: keypoints are projections of visible landmarks.

    Slot layout matches the real extractor: tracked slots first, then
    'detected' slots for visible landmarks not currently tracked. Descriptors
    of tracked slots are looked up through the tracker's track->landmark map.
    """

    def __init__(self, world: SyntheticWorld, tracker: Optional[TrackSimulator] = None,
                 pix_noise=0.0, seed=1):
        self.world = world
        self.tracker = tracker
        self.pix_noise = pix_noise
        self.rng = np.random.default_rng(seed)

    def detect_and_extract(self, frame_token, tracked_xy, track_ids, key=None):
        frame = int(np.asarray(frame_token).reshape(-1)[0])
        vis, pix = visible_landmarks(self.world, frame)
        if track_ids is not None and len(track_ids) and self.tracker is not None:
            tracked_landmarks = self.tracker.landmarks_of(track_ids)
        elif track_ids is not None:
            tracked_landmarks = np.asarray(track_ids, np.int64)
        else:
            tracked_landmarks = np.zeros(0, np.int64)
        tracked_set = set(int(l) for l in tracked_landmarks)

        pts, octs, angs, descs, tids = [], [], [], [], []
        # tracked slots first (mirror orb_extractor.cpp:89-124)
        if tracked_xy is not None and len(tracked_xy):
            for p, t, li in zip(tracked_xy, track_ids, tracked_landmarks):
                pts.append(np.asarray(p, np.float32))
                octs.append(1)
                angs.append(0.0)
                descs.append(self.world.descriptors[int(li)])
                tids.append(int(t))
        for li in vis:
            if int(li) in tracked_set:
                continue
            p = pix[li]
            if self.pix_noise:
                p = p + self.rng.normal(0, self.pix_noise, 2)
            pts.append(np.asarray(p, np.float32))
            octs.append(0)
            angs.append(0.0)
            descs.append(self.world.descriptors[li])
            tids.append(-1)
        n = len(pts)
        return FrontendResult(
            pts=np.array(pts, np.float32).reshape(n, 2),
            octave=np.array(octs, np.int32),
            angle=np.array(angs, np.float32),
            descriptors=np.array(descs, np.uint32).reshape(n, 8),
            valid=np.ones(n, bool),
            track_ids=np.array(tids, np.int32))


def make_mapper_input(world: SyntheticWorld, frame: int,
                      tracker: TrackSimulator, trail_len=8,
                      with_depth=False) -> MapperInput:
    ids, pts = tracker.tracks_for_frame(frame)
    trail = []
    for j in range(frame, max(-1, frame - trail_len), -1):
        trail.append(Pose(frame_number=j, t=world.times[j],
                          pose_cw=world.odometry_cw[j].copy(),
                          uncertainty=np.zeros((3, 6))))
    depths = None
    if with_depth:
        T = world.poses_cw[frame]
        lms = tracker.landmarks_of(ids)
        pc = world.landmarks[lms] @ T[:3, :3].T + T[:3, 3]
        depths = np.linalg.norm(pc, axis=1).astype(np.float32)
    return MapperInput(
        frame=np.array([frame]),
        camera=world.camera,
        track_ids=ids,
        track_pts=pts,
        track_depths=depths,
        pose_trail=trail,
        t=world.times[frame])
