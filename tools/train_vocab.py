"""Train a hierarchical binary ORB vocabulary for place recognition.

TPU-native replacement for the reference's offline-trained DBoW2 vocabulary
(~10^6 words, 6 levels, k=10, loaded in bow_index.cpp:12-28). DBoW2 needs a
deep tree to make CPU quantization cheap; our quantizer is one Hamming GEMM
against the full leaf table (`ops/bow.quantize`), so a 2-level hierarchy is
enough — and the level-1 clusters double as the feature-bucketing *groups*
(the `levelsUp=4` node ids of bow_index.cpp:82-92):

  level 1: G = bowFeatureGroups binary k-means centroids,
  level 2: V/G leaf centroids per level-1 cluster.

Word ids are assigned group-major, so `group = word // (V/G)` — the contract
the matchers and the fused front-end already rely on.

Training data: ORB descriptors harvested by running the production front-end
(`ops/frontend.OrbExtractor`) over many rendered synthetic worlds (the same
renderer as bench.py, varied seeds/trajectories/textures).

Usage:
  python tools/train_vocab.py --words 65536 --groups 128 --frames 800 \
      --out slam_tpu/data/vocab_65536.npz
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def harvest_descriptors(n_frames: int, width: int = 640, height: int = 480,
                        max_keypoints: int = 1000, seed0: int = 0,
                        frames_per_world: int = 40) -> np.ndarray:
    """Render synthetic textured worlds and run the production ORB front-end."""
    from bench import render_frame, render_world
    from slam_tpu.ops.frontend import OrbExtractor
    from slam_tpu.params import Parameters, ParametersSlam, StaticSettings

    settings = StaticSettings(Parameters(slam=ParametersSlam(
        maxKeypoints=max_keypoints)))
    ex = OrbExtractor(settings, width, height, max_tracked=8)

    out = []
    n_worlds = (n_frames + frames_per_world - 1) // frames_per_world
    t0 = time.time()
    for w in range(n_worlds):
        world, patches = render_world(
            n_frames=frames_per_world, n_landmarks=400 + 60 * (w % 7),
            seed=seed0 + w)
        # texture variety: alternate high-frequency dots with smoothed blobs
        if w % 3 == 1:
            rng = np.random.default_rng(seed0 + 1000 + w)
            patches = rng.integers(0, 256, patches.shape).astype(np.uint8)
        elif w % 3 == 2:
            k = np.ones((3, 3)) / 9.0
            sm = patches.astype(np.float32)
            for _ in range(2):
                sm = np.stack([_conv2_same(p, k) for p in sm])
            patches = np.clip(sm, 0, 255).astype(np.uint8)
        keys = list(range(frames_per_world))
        # pipeline the device dispatches: prefetch all, then collect
        for i in keys:
            ex.prefetch(("h", w, i), render_frame(world, patches, i))
        for i in keys:
            res = ex.detect_and_extract(None, key=("h", w, i)).compact()
            out.append(res.descriptors)
        done = (w + 1) * frames_per_world
        print(f"  harvested {done}/{n_frames} frames, "
              f"{sum(len(d) for d in out)} descriptors, "
              f"{time.time() - t0:.0f}s", flush=True)
        if done >= n_frames:
            break
    return np.concatenate(out)


def _conv2_same(img, k):
    from numpy.lib.stride_tricks import sliding_window_view
    pad = k.shape[0] // 2
    p = np.pad(img, pad, mode="edge")
    return np.einsum("ijkl,kl->ij", sliding_window_view(p, k.shape), k)


def _assign(desc: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment (native C++ popcount when available)."""
    from slam_tpu import native
    words = native.hamming_argmin(desc, centroids)
    if words is not None:
        return words
    from slam_tpu.ops.hamming import hamming_matrix_host
    return np.argmin(hamming_matrix_host(desc, centroids), axis=1).astype(np.int32)


def _majority_update(desc_bits: np.ndarray, assign: np.ndarray,
                     k: int) -> np.ndarray:
    """Binary k-means centroid update: per-cluster bitwise majority vote."""
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    sums = np.zeros((k, desc_bits.shape[1]), np.int64)
    np.add.at(sums, assign, desc_bits)
    maj = (2 * sums > counts[:, None]).astype(np.uint8)
    return maj, counts


def _pack(bits: np.ndarray) -> np.ndarray:
    """(K, 256) bits -> (K, 8) uint32 in ORB descriptor layout."""
    by = np.packbits(bits, axis=1, bitorder="little")
    return by.view(np.uint32)


def _unpack(desc: np.ndarray) -> np.ndarray:
    """(N, 8) uint32 -> (N, 256) bits."""
    return np.unpackbits(desc.view(np.uint8), axis=1, bitorder="little")


def binary_kmeans(desc: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Lloyd iterations with Hamming distance + majority-vote centroids."""
    n = len(desc)
    if n == 0:
        return rng.integers(0, 2 ** 32, (k, 8), dtype=np.uint32)
    init = rng.choice(n, size=min(k, n), replace=False)
    cent = desc[init]
    if len(cent) < k:  # fewer samples than clusters: pad with perturbations
        extra = desc[rng.integers(0, n, k - len(cent))].copy()
        extra ^= (np.uint32(1) << rng.integers(0, 32, extra.shape).astype(np.uint32))
        cent = np.concatenate([cent, extra])
    bits = _unpack(desc)
    for _ in range(iters):
        a = _assign(desc, cent)
        maj, counts = _majority_update(bits, a, k)
        cent = _pack(maj)
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            cent[empty] = desc[rng.integers(0, n, len(empty))]
            flip = (np.uint32(1) << rng.integers(0, 32, (len(empty), 8)).astype(np.uint32))
            cent[empty] ^= flip
    return cent


def train_vocabulary(desc: np.ndarray, num_words: int, num_groups: int,
                     iters: int = 8, seed: int = 94235682) -> np.ndarray:
    """Two-level hierarchical binary k-means; returns (V, 8) uint32 leaves
    ordered group-major (word // (V/G) = level-1 cluster)."""
    assert num_words % num_groups == 0
    leaves_per_group = num_words // num_groups
    rng = np.random.default_rng(seed)

    print(f"level 1: {num_groups} clusters over {len(desc)} descriptors",
          flush=True)
    level1 = binary_kmeans(desc, num_groups, iters, rng)
    a1 = _assign(desc, level1)

    vocab = np.zeros((num_words, 8), np.uint32)
    order = np.argsort(a1, kind="stable")
    bounds = np.searchsorted(a1[order], np.arange(num_groups + 1))
    for g in range(num_groups):
        sub = desc[order[bounds[g]:bounds[g + 1]]]
        vocab[g * leaves_per_group:(g + 1) * leaves_per_group] = \
            binary_kmeans(sub, leaves_per_group, iters, rng)
        if g % 16 == 0:
            print(f"level 2: group {g}/{num_groups} ({len(sub)} descriptors)",
                  flush=True)
    return vocab


def quantization_stats(desc: np.ndarray, vocab: np.ndarray) -> dict:
    """Word-usage balance diagnostics (a trained vocabulary should spread
    mass over far more words than random LSH centroids)."""
    sample = desc[np.random.default_rng(0).choice(
        len(desc), min(len(desc), 100_000), replace=False)]
    words = _assign(sample, vocab)
    hist = np.bincount(words, minlength=len(vocab))
    p = hist / hist.sum()
    nz = p[p > 0]
    return {
        "words_used": int((hist > 0).sum()),
        "vocab_size": len(vocab),
        "entropy_bits": float(-(nz * np.log2(nz)).sum()),
        "max_word_share": float(p.max()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=65536)
    ap.add_argument("--groups", type=int, default=128)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--desc-cache", default="/tmp/vocab_descriptors.npy",
                    help="harvested descriptors cache (skips render+ORB)")
    args = ap.parse_args()

    if args.desc_cache and os.path.exists(args.desc_cache):
        desc = np.load(args.desc_cache)
        print(f"loaded {len(desc)} cached descriptors", flush=True)
    else:
        desc = harvest_descriptors(args.frames)
        if args.desc_cache:
            np.save(args.desc_cache, desc)
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "slam_tpu", "data",
        f"vocab_{args.words}.npz")
    vocab = train_vocabulary(desc, args.words, args.groups, args.iters)
    stats = quantization_stats(desc, vocab)
    print("stats:", stats, flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, codebook=vocab,
                        num_groups=np.int64(args.groups),
                        trained_on=np.int64(len(desc)))
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
