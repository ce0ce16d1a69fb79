#!/usr/bin/env python
"""Vocabulary domain-transfer evaluation: revisit recall per texture domain.

The shipped retrieval vocabulary (`slam_tpu/data/vocab_65536.npz`,
tools/train_vocab.py) is trained on descriptors harvested from THIS repo's
dot-field renderer. The reference's DBoW2 vocabulary is trained on real
imagery and used across arbitrary scenes (bow_index.cpp:12-28) — so the
question this tool answers with data: does OUR vocabulary's revisit recall
transfer to texture domains it never saw?

Per domain, a two-lap trajectory whose second lap revisits the first lap's
poses exactly is RENDERED to images, the production ORB front-end extracts
descriptors, the first lap is indexed (`ops/bow.BowIndex`), and each
second-lap frame queries `get_bow_similar`; recall = fraction of queries
whose same-lap-position keyframe (within +-2 frames) appears in the
returned candidates.

Domains:
  dots    — bench.py dot-field world (the TRAINING domain; sanity floor)
  room    — EuRoC-class textured room, held-out seed (block textures)
  tiled   — repeating-texture room (adversarial: identical patches recur)
  street  — KITTI-class street canyon (held-out block statistics + ground)

Usage: python tools/eval_vocab_transfer.py [--lap 40] [--vocab PATH] [--cpu]
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


def _loop_world_frames(lap, seed):
    """Training-domain dot world, two laps (identical second-lap poses)."""
    from synthetic_world import default_camera, make_world
    from bench import render_frame, render_world  # noqa: F401 (render only)

    cam = default_camera(640, 480)
    world = make_world(n_frames=2 * lap, n_landmarks=700, seed=seed,
                       trajectory="loop", lap_frames=lap, camera=cam)
    rng = np.random.default_rng(seed + 1)
    patches = rng.integers(40, 255, (700, 11, 11)).astype(np.uint8)
    frames = [render_frame(world, patches, i) for i in range(2 * lap)]
    return frames, 640, 480


def _room_frames(lap, seed, tile):
    from run_euroc_synthetic import CAM, circle_pose_cw, make_scene, render

    scene = make_scene(seed, tile=tile)
    frames = []
    for i in range(2 * lap):
        phase = 2.0 * np.pi * (i % lap) / lap
        frames.append(render(scene, circle_pose_cw(phase)))
    return frames, CAM.width, CAM.height


def _street_frames(lap, seed):
    from run_euroc_synthetic import render
    from run_kitti_synthetic import (CAM, FPS, SPEED, circle_pose_cw,
                                     make_street_scene)

    # shrink the circuit so one lap fits in `lap` frames at KITTI speed
    radius = lap * (SPEED / FPS) / (2.0 * np.pi)
    f = radius / 80.0
    scene = make_street_scene(seed, outer=95.0 * f, inner=52.0 * f)
    frames = []
    for i in range(2 * lap):
        phase = 2.0 * np.pi * (i % lap) / lap
        frames.append(render(scene, circle_pose_cw(phase, radius=radius),
                             cam=CAM))
    return frames, CAM.width, CAM.height


def eval_domain(name, frames, width, height, lap, vocab_path=None,
                min_gap=None):
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

    def make_kf(i):
        res = ex.detect_and_extract(frames[i], no_pts, no_ids)
        kf = Keyframe()
        kf.id = KfId(i)
        kf.shared.descriptors = np.asarray(res.descriptors)[
            np.asarray(res.valid)]
        index.transform(kf.shared)
        return kf

    t0 = time.time()
    for i in range(lap):
        index.add(make_kf(i), CURRENT_MAP_ID)
    hits = total = 0
    n_cands = []
    for i in range(lap, 2 * lap):
        got = {int(s.map_kf.kf_id)
               for s in index.get_bow_similar(db, [], make_kf(i))}
        n_cands.append(len(got))
        total += 1
        target = i - lap
        if any(abs(g - target) <= 2 or abs(g - target) >= lap - 2
               for g in got):
            hits += 1
    return {"domain": name, "lap": lap, "recall": round(hits / total, 3),
            "mean_candidates": round(float(np.mean(n_cands)), 1),
            "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lap", type=int, default=40)
    ap.add_argument("--seed", type=int, default=100)  # held-out from training
    ap.add_argument("--domains", nargs="+",
                    default=["dots", "room", "tiled", "street"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for d in args.domains:
        if d == "dots":
            frames, w, h = _loop_world_frames(args.lap, args.seed)
        elif d == "room":
            frames, w, h = _room_frames(args.lap, args.seed, tile=0)
        elif d == "tiled":
            frames, w, h = _room_frames(args.lap, args.seed, tile=8)
        elif d == "street":
            frames, w, h = _street_frames(args.lap, args.seed)
        else:
            raise ValueError(d)
        row = eval_domain(d, frames, w, h, args.lap)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| domain | recall | mean candidates |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['domain']} | {r['recall']:.2f} | "
              f"{r['mean_candidates']} |")


if __name__ == "__main__":
    main()
