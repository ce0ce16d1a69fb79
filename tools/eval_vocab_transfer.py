#!/usr/bin/env python
"""Vocabulary domain-transfer evaluation: revisit recall vs PERTURBATION.

The shipped retrieval vocabulary (`slam_tpu/data/vocab_65536.npz`,
tools/train_vocab.py) is trained on descriptors harvested from THIS repo's
dot-field renderer. The reference's DBoW2 vocabulary is trained on real
imagery and used across arbitrary scenes (bow_index.cpp:12-28) — so the
question this tool answers with data: does OUR vocabulary's revisit recall
transfer to texture domains it never saw?

Round-4 postmortem: the original eval's second lap revisited the first
lap's poses EXACTLY, and every renderer is a pure function of pose — so
each query image was byte-identical to an indexed image and recall 1.00 was
guaranteed for any deterministic quantizer. It measured nothing about
quantization-boundary robustness. This version PERTURBS the queries:

  geometric   — lateral camera offset (m, camera-x) + yaw offset (deg)
  photometric — exposure gain, brightness bias, additive Gaussian noise

swept over levels L0 (exact; the old eval's sanity floor) .. L3, reporting
a recall-vs-perturbation curve per domain plus the score-separation margin
(min genuine-revisit cosine score minus max bootstrap false-positive score,
the quantity `calibrate_loop_gate`'s margin must fit under).

Domains:
  dots    — bench.py dot-field world (the TRAINING domain)
  room    — EuRoC-class textured room, held-out seed (block textures)
  tiled   — repeating-texture room (adversarial: identical patches recur)
  street  — KITTI-class street canyon (held-out block statistics + ground)

Usage: python tools/eval_vocab_transfer.py [--lap 32] [--cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


# (lateral m, yaw deg, gain, bias, noise sigma) per perturbation level
LEVELS = [
    ("L0_exact", 0.0, 0.0, 1.0, 0.0, 0.0),
    ("L1_mild", 0.10, 4.0, 0.95, 5.0, 3.0),
    ("L2_moderate", 0.25, 10.0, 0.90, 10.0, 5.0),
    ("L3_strong", 0.50, 20.0, 0.85, -15.0, 8.0),
]


def _perturb_pose(pose_cw, dx, dyaw_deg):
    from slam_tpu.geometry import se3

    R = pose_cw[:3, :3]
    t = pose_cw[:3, 3]
    c = -R.T @ t
    c2 = c + R.T @ np.array([dx, 0.0, 0.0])
    dR = se3.so3_exp(np.array([0.0, np.radians(dyaw_deg), 0.0]))
    R2 = dR @ R
    out = np.eye(4)
    out[:3, :3] = R2
    out[:3, 3] = -R2 @ c2
    return out


def _photometric(img, gain, bias, sigma, rng):
    out = img.astype(np.float32) * gain + bias
    if sigma > 0:
        out = out + rng.normal(0.0, sigma, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def _dots_domain(lap, seed):
    """Training-domain dot world; queries re-render at perturbed poses."""
    from synthetic_world import default_camera, make_world
    from bench import render_frame

    cam = default_camera(640, 480)
    world = make_world(n_frames=lap, n_landmarks=700, seed=seed,
                       trajectory="loop", lap_frames=lap, camera=cam)
    rng = np.random.default_rng(seed + 1)
    patches = rng.integers(40, 255, (700, 11, 11)).astype(np.uint8)
    index_frames = [render_frame(world, patches, i) for i in range(lap)]

    def query(i, dx, dyaw):
        orig = world.poses_cw[i]
        world.poses_cw[i] = _perturb_pose(orig, dx, dyaw)
        try:
            return render_frame(world, patches, i)
        finally:
            world.poses_cw[i] = orig

    return index_frames, query, 640, 480


def _room_domain(lap, seed, tile):
    from run_euroc_synthetic import CAM, circle_pose_cw, make_scene, render

    scene = make_scene(seed, tile=tile)
    poses = [circle_pose_cw(2.0 * np.pi * i / lap) for i in range(lap)]
    index_frames = [render(scene, p) for p in poses]

    def query(i, dx, dyaw):
        return render(scene, _perturb_pose(poses[i], dx, dyaw))

    return index_frames, query, CAM.width, CAM.height


def _street_domain(lap, seed):
    from run_euroc_synthetic import render
    from run_kitti_synthetic import (CAM, FPS, SPEED, circle_pose_cw,
                                     make_street_scene)

    radius = lap * (SPEED / FPS) / (2.0 * np.pi)
    f = radius / 80.0
    scene = make_street_scene(seed, outer=95.0 * f, inner=52.0 * f)
    poses = [circle_pose_cw(2.0 * np.pi * i / lap, radius=radius)
             for i in range(lap)]
    index_frames = [render(scene, p, cam=CAM) for p in poses]

    def query(i, dx, dyaw):
        return render(scene, _perturb_pose(poses[i], dx, dyaw), cam=CAM)

    return index_frames, query, CAM.width, CAM.height


def eval_domain(name, index_frames, query_fn, width, height, lap,
                vocab_path=None, seed=0):
    from slam_tpu.ids import CURRENT_MAP_ID, KfId
    from slam_tpu.map.keyframe import Keyframe
    from slam_tpu.map.mapdb import MapDB
    from slam_tpu.ops.bow import BowIndex
    from slam_tpu.ops.frontend import OrbExtractor
    from slam_tpu.params import Parameters, ParametersSlam, StaticSettings

    kw = {"maxKeypoints": 600}
    if vocab_path:
        kw["vocabularyPath"] = vocab_path
    ps = ParametersSlam(**kw)
    settings = StaticSettings(Parameters(slam=ps))
    ex = OrbExtractor(settings, width, height, max_tracked=8)
    index = BowIndex(ps)
    db = MapDB()
    no_ids = np.zeros(0, np.int64)
    no_pts = np.zeros((0, 2), np.float32)

    def make_kf(img, i):
        res = ex.detect_and_extract(img, no_pts, no_ids)
        kf = Keyframe()
        kf.id = KfId(i)
        kf.shared.descriptors = np.asarray(res.descriptors)[
            np.asarray(res.valid)]
        index.transform(kf.shared)
        return kf

    t0 = time.time()
    indexed = []
    for i, img in enumerate(index_frames):
        kf = make_kf(img, i)
        index.add(kf, CURRENT_MAP_ID)
        indexed.append(kf)

    rng = np.random.default_rng(seed + 77)
    rows = []
    for (lname, dx, dyaw, gain, bias, sigma) in LEVELS:
        hits = total = 0
        n_cands = []
        genuine_scores = []
        for i in range(lap):
            img = _photometric(query_fn(i, dx, dyaw), gain, bias, sigma, rng)
            qkf = make_kf(img, lap + i)
            sims = index.get_bow_similar(db, [], qkf)
            got = {int(s.map_kf.kf_id) for s in sims}
            n_cands.append(len(got))
            total += 1
            ok = any(abs(g - i) <= 2 or abs(g - i) >= lap - 2 for g in got)
            hits += ok
            # raw cosine score vs the true-revisit keyframe (gate margin
            # analysis, independent of the candidate-set gates)
            genuine_scores.append(float(
                index.score(qkf.shared, indexed[i].shared)))
        rows.append({
            "domain": name, "level": lname, "lap": lap,
            "recall": round(hits / total, 3),
            "mean_candidates": round(float(np.mean(n_cands)), 1),
            "min_genuine_score": round(float(np.min(genuine_scores)), 3),
            "mean_genuine_score": round(float(np.mean(genuine_scores)), 3),
            "wall_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lap", type=int, default=32)
    ap.add_argument("--seed", type=int, default=100)  # held-out from training
    ap.add_argument("--domains", nargs="+",
                    default=["dots", "room", "tiled", "street"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    all_rows = []
    for d in args.domains:
        if d == "dots":
            idx, q, w, h = _dots_domain(args.lap, args.seed)
        elif d == "room":
            idx, q, w, h = _room_domain(args.lap, args.seed, tile=0)
        elif d == "tiled":
            idx, q, w, h = _room_domain(args.lap, args.seed, tile=8)
        elif d == "street":
            idx, q, w, h = _street_domain(args.lap, args.seed)
        else:
            raise ValueError(d)
        all_rows.extend(eval_domain(d, idx, q, w, h, args.lap,
                                    seed=args.seed))

    print("\n| domain | level | recall | mean cands | min genuine score |")
    print("|---|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['domain']} | {r['level']} | {r['recall']:.2f} | "
              f"{r['mean_candidates']} | {r['min_genuine_score']:.3f} |")


if __name__ == "__main__":
    main()
