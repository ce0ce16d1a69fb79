#!/usr/bin/env python
"""Default-preset accuracy matrix for the device-resident VO backend.

Answers the safe-defaults question with data: does the DEFAULT
`DeviceVOConfig` (no hand-tuned preset) beat the odometry it is fed at
every drift level, on both the EuRoC-class room AND the adversarial
repeating-texture room (`make_scene(tile=8)`)? Sweeps:

  world    : distinct textures (tile=0) | repeating textures (tile=8)
  drift    : odometry random-walk sigma per frame
  variant  : default | default+lowe0.9 | default+window8 | frozen preset

Frames are rendered ONCE per world (drift only perturbs the odometry
deltas, not the imagery), and compiled scan programs are shared across
drift levels per variant, so the matrix costs render + S*N*V VO passes.

Output: one JSON line per cell plus a markdown summary table, written to
stdout (redirect into RESULTS.md material).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_euroc_synthetic import CAM, make_scene, make_sequence, render

from slam_tpu.geometry import se3


VARIANTS = {
    "default": {},
    "default+lowe0.9": {"match_lowe_ratio": 0.9},
    "default+window8": {"window": 8},
    "frozen": {"stale_age": None, "max_depth_step": 0.0},  # stale_age->N
    # odometry-prior weighting experiments on the window8 base: at low
    # drift the VO noise floor exceeds the odometry error, so the solve
    # must stay anchored to its prior until the map has earned trust
    "w8+odo300": {"window": 8, "odom_pos_weight": 300.0,
                  "odom_rot_weight": 3000.0},
    "w8+odo1000": {"window": 8, "odom_pos_weight": 1000.0,
                   "odom_rot_weight": 10000.0},
    "w8+obs0.5": {"window": 8, "obs_weight_scale": 0.5},
    "w8+odo300+obs0.5": {"window": 8, "odom_pos_weight": 300.0,
                         "odom_rot_weight": 3000.0, "obs_weight_scale": 0.5},
    "w8+lowe0.9": {"window": 8, "match_lowe_ratio": 0.9},
    "w8+maturity": {"window": 8, "window_maturity_weight": True},
    "w8+maturity+odo300": {"window": 8, "window_maturity_weight": True,
                           "odom_pos_weight": 300.0,
                           "odom_rot_weight": 3000.0},
}


def ate(centers, gt_centers):
    err = centers - gt_centers
    err = err - err.mean(axis=0)
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--sequences", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--drifts", type=float, nargs="+",
                    default=[0.0015, 0.004, 0.008])
    ap.add_argument("--tiles", type=int, nargs="+", default=[0, 8])
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from slam_tpu.pipeline.device_vo import BatchedDeviceVO, DeviceVOConfig

    n_frames = (args.frames // args.chunk) * args.chunk
    S = args.sequences
    rows = []
    for tile in args.tiles:
        # render once per world; gt poses shared by every cell
        t0 = time.perf_counter()
        world_seqs = []
        for s in range(S):
            scene = make_scene(args.seed + s, tile=tile)
            _, poses_cw = make_sequence(n_frames, args.seed + s)
            frames = np.stack([render(scene, poses_cw[i])
                               for i in range(n_frames)])
            world_seqs.append((poses_cw, frames))
        print(f"# world tile={tile}: rendered {S}x{n_frames} frames "
              f"in {time.perf_counter() - t0:.0f}s", file=sys.stderr,
              flush=True)
        images = np.stack([w[1] for w in world_seqs])

        for drift in args.drifts:
            # drifted odometry (same construction as run_device_vo_euroc)
            deltas_all, odo_all = [], []
            for s in range(S):
                poses_cw = world_seqs[s][0]
                rng = np.random.default_rng(args.seed + s + 7)
                drift_rw = np.zeros(3)
                odo = []
                for i in range(n_frames):
                    drift_rw += rng.normal(0.0, drift, 3)
                    odo.append(se3.se3_exp(
                        np.concatenate([np.zeros(3), drift_rw]))
                        @ poses_cw[i])
                odo = np.stack(odo)
                deltas_all.append(np.stack(
                    [np.eye(4, dtype=np.float32)]
                    + [(odo[i] @ np.linalg.inv(odo[i - 1])).astype(np.float32)
                       for i in range(1, n_frames)]))
                odo_all.append(odo)
            deltas = np.stack(deltas_all)

            for name in args.variants:
                over = dict(VARIANTS[name])
                if over.get("stale_age", 0) is None:
                    over["stale_age"] = n_frames
                cfg = DeviceVOConfig(width=CAM.width, height=CAM.height,
                                     lm_capacity=512, max_keypoints=600,
                                     **over)
                vo = BatchedDeviceVO(cfg, batch=S, camera=CAM)
                p0 = np.stack([w[0][0] for w in world_seqs]).astype(np.float32)
                vo.reset(poses0_cw=p0)
                outs = []
                for c in range(n_frames // args.chunk):
                    sl = slice(c * args.chunk, (c + 1) * args.chunk)
                    outs.append(vo.advance(images[:, sl], deltas[:, sl]))
                poses = np.concatenate(
                    [np.asarray(jax.device_get(o.pose_cw)) for o in outs],
                    axis=1)
                ate_vo, ate_od = [], []
                for s in range(S):
                    gt_c = np.stack([se3.camera_center(p)
                                     for p in world_seqs[s][0]])
                    vo_c = np.stack([se3.camera_center(p) for p in poses[s]])
                    od_c = np.stack([se3.camera_center(p)
                                     for p in odo_all[s]])
                    ate_vo.append(ate(vo_c, gt_c))
                    ate_od.append(ate(od_c, gt_c))
                row = {"tile": tile, "drift": drift, "variant": name,
                       "ate_vo_m": round(float(np.mean(ate_vo)), 4),
                       "ate_odometry_m": round(float(np.mean(ate_od)), 4),
                       "beats_odometry":
                           bool(np.mean(ate_vo) < np.mean(ate_od))}
                rows.append(row)
                print(json.dumps(row), flush=True)

    print("\n| world | drift | " + " | ".join(args.variants)
          + " | odometry |")
    print("|---|---|" + "---|" * (len(args.variants) + 1))
    for tile in args.tiles:
        for drift in args.drifts:
            cells = {r["variant"]: r for r in rows
                     if r["tile"] == tile and r["drift"] == drift}
            od = next(iter(cells.values()))["ate_odometry_m"]
            name = "tiled" if tile else "euroc"
            vals = " | ".join(
                f"**{cells[v]['ate_vo_m']:.3f}**"
                if cells[v]["beats_odometry"] else
                f"{cells[v]['ate_vo_m']:.3f}" for v in args.variants)
            print(f"| {name} | {drift} | {vals} | {od:.3f} |")


if __name__ == "__main__":
    main()
