"""Fused ORB front-end: pyramid + detection + orientation + descriptors.

TPU-native equivalent of the reference's ``OrbExtractor::detectAndExtract``
(reference: orb_extractor.cpp:73-164): for a keyframe it
  1) updates the image pyramid (here: MXU matmul chain, `ops/pyramid.py`),
  2) converts LK-tracked points to ORB keypoints at the fixed pyramid level
     ``orbLkTrackLevel`` (orb_extractor.cpp:89-124),
  3) detects fresh corners at every level with per-level budgets and 19-px
     margins (feature_detector.cpp, `ops/detector.py`),
  4) computes IC-angle orientations and rotated-BRIEF descriptors
     (`ops/orb.py`).

The whole frame is ONE jit-compiled device call returning fixed-layout padded
arrays — no per-level host round trips. Slot layout of the output arrays:

    [0, max_tracked)                      tracked-keypoint slots
    [max_tracked + sum(budgets[:l]), ...) level-l detected slots

with a validity mask; invalid slots hold garbage and must be ignored.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tpu.ops import detector as det
from slam_tpu.ops import orb
from slam_tpu.ops.pyramid import _pyramid_operators, _build_pyramid_impl, level_sizes
from slam_tpu.params import ORB_PATCH_RADIUS, StaticSettings
from slam_tpu.utils.timer import timed


@dataclasses.dataclass
class FrontendResult:
    """Padded per-frame features (NumPy, on host)."""
    pts: np.ndarray        # (N, 2) float32, full-resolution pixel coords
    octave: np.ndarray     # (N,) int32 pyramid level
    angle: np.ndarray      # (N,) float32 degrees
    descriptors: np.ndarray  # (N, 8) uint32
    valid: np.ndarray      # (N,) bool
    track_ids: np.ndarray  # (N,) int32, -1 for detected (non-tracked) slots
    words: Optional[np.ndarray] = None  # (N,) int32 BoW word ids (on-device)

    def compact(self) -> "FrontendResult":
        """Drop invalid slots."""
        v = self.valid
        return FrontendResult(self.pts[v], self.octave[v], self.angle[v],
                              self.descriptors[v], np.ones(int(v.sum()), bool),
                              self.track_ids[v],
                              None if self.words is None else self.words[v])


def _min_distances(settings: StaticSettings, sizes) -> List[int]:
    """Per-level GFTT min distance (reference: feature_detector.cpp:79-82)."""
    out = []
    for (w, h) in sizes:
        su = min(w, h) / 720.0 * 0.8
        out.append(int(np.floor(settings.parameters.slam.gfttMinDistance * su + 0.5)))
    return out


@functools.partial(jax.jit, static_argnames=("spec",))
def _extract_impl(image, tracked_xy, tracked_valid, spec):
    (scale_factors, budgets, min_dists, lk_level, use_fast, width, height,
     vocab_size) = spec[:8]
    vocab_path = spec[8] if len(spec) > 8 else ""
    sizes, resize_ops, blur_ops = _pyramid_operators(width, height, scale_factors)
    levels, blurred = _build_pyramid_impl(image.astype(jnp.float32), resize_ops, blur_ops)

    out_pts, out_oct, out_ang, out_desc, out_valid = [], [], [], [], []

    # --- tracked keypoints at the fixed LK level (orb_extractor.cpp:89-124)
    lk_scale = np.float32(scale_factors[lk_level])
    lk_img = levels[lk_level]
    lk_blur = blurred[lk_level]
    lk_w, lk_h = sizes[lk_level]
    xi = jnp.rint(tracked_xy[:, 0] / lk_scale)
    yi = jnp.rint(tracked_xy[:, 1] / lk_scale)
    margin = ORB_PATCH_RADIUS
    t_ok = (tracked_valid
            & (xi >= margin) & (yi >= margin)
            & (xi < lk_w - margin) & (yi < lk_h - margin))
    t_xy = jnp.stack([xi, yi], axis=-1)
    t_ang, t_desc = orb.compute_orb(lk_img, lk_blur, t_xy)
    out_pts.append(tracked_xy)            # tracked keypoints keep original coords
    out_oct.append(jnp.full(t_xy.shape[:1], lk_level, jnp.int32))
    out_ang.append(t_ang)
    out_desc.append(t_desc)
    out_valid.append(t_ok)

    # --- detected keypoints per level
    for lvl, (lvl_img, lvl_blur) in enumerate(zip(levels, blurred)):
        budget = budgets[lvl]
        if budget <= 0:
            continue
        q = jnp.rint(jnp.clip(lvl_img, 0.0, 255.0))
        if use_fast:
            resp = det.fast_response(q)
        else:
            resp = det.shi_tomasi_response(q)
        xy, _, valid = det.select_keypoints(resp, budget, min_dists[lvl])
        ang, desc = orb.compute_orb(lvl_img, lvl_blur, xy)
        out_pts.append(xy * np.float32(scale_factors[lvl]))
        out_oct.append(jnp.full((budget,), lvl, jnp.int32))
        out_ang.append(ang)
        out_desc.append(desc)
        out_valid.append(valid)

    desc_all = jnp.concatenate(out_desc)
    # --- BoW quantization fused in: the descriptors are already on device,
    # and nearest-codeword search is one popcount-GEMM on the MXU + argmin
    # (identical words to ops/bow.quantize: exact integer distances,
    # first-minimum tie-breaking). Saves the ~4 ms host scan per keyframe.
    if vocab_size > 0:
        from slam_tpu.ops.bow import make_codebook
        from slam_tpu.ops.hamming import unpack_bits_pm1
        cb = unpack_bits_pm1(jnp.asarray(make_codebook(vocab_size,
                                                       path=vocab_path)))
        a = unpack_bits_pm1(desc_all)
        dot = jax.lax.dot_general(a, cb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        words = jnp.argmin((256 - dot) // 2, axis=1).astype(jnp.int32)
    else:
        words = jnp.zeros(desc_all.shape[:1], jnp.int32)

    return (jnp.concatenate(out_pts), jnp.concatenate(out_oct),
            jnp.concatenate(out_ang), desc_all,
            jnp.concatenate(out_valid), words)


class OrbExtractor:
    """Per-geometry compiled front-end (reference: orb_extractor.hpp:16-20)."""

    def __init__(self, settings: StaticSettings, width: int, height: int,
                 max_tracked: int = 256):
        p = settings.parameters.slam
        self.settings = settings
        self.width = width
        self.height = height
        self.max_tracked = max_tracked
        scale_factors = tuple(float(s) for s in settings.scaleFactors)
        sizes = level_sizes(width, height, scale_factors)
        self.sizes = sizes
        budgets = tuple(settings.maxNumberOfKeypointsPerLevel())
        min_dists = tuple(_min_distances(settings, sizes))
        use_fast = p.slamFeatureDetector.lower() == "fast"
        self._spec = (scale_factors, budgets, min_dists, int(p.orbLkTrackLevel),
                      bool(use_fast), width, height,
                      int(getattr(p, "bowVocabularySize", 0)),
                      str(getattr(p, "vocabularyPath", "")))
        self.num_slots = max_tracked + sum(budgets)
        self._pending = {}
        # device copies of the packed tracked-point buffers, reused while the
        # contents are unchanged (every device put costs ms on the tunnel;
        # with no LK tracks the buffers are identical every frame)
        self._dev_tracked_key = None
        self._dev_txy = None
        self._dev_tvalid = None

    def _tracked_device(self, txy: np.ndarray, tvalid: np.ndarray):
        key = (txy.tobytes(), tvalid.tobytes())
        if key != self._dev_tracked_key:
            self._dev_tracked_key = key
            self._dev_txy = jnp.asarray(txy)
            self._dev_tvalid = jnp.asarray(tvalid)
        return self._dev_txy, self._dev_tvalid

    def _pack_tracked(self, tracked_xy, track_ids):
        kt = self.max_tracked
        txy = np.zeros((kt, 2), np.float32)
        tvalid = np.zeros((kt,), bool)
        tids = np.full((self.num_slots,), -1, np.int32)
        if tracked_xy is not None and len(tracked_xy) > 0:
            k = min(len(tracked_xy), kt)
            txy[:k] = np.asarray(tracked_xy, np.float32)[:k]
            tvalid[:k] = True
            if track_ids is not None:
                tids[:k] = np.asarray(track_ids, np.int32)[:k]
        return txy, tvalid, tids

    def prefetch(self, key, image: np.ndarray,
                 tracked_xy: Optional[np.ndarray] = None,
                 track_ids: Optional[np.ndarray] = None) -> None:
        """Dispatch extraction for a future frame WITHOUT blocking.

        XLA execution is asynchronous: the returned device arrays are
        futures, so the extraction overlaps the host-side pipeline work of
        the current frame. ``detect_and_extract(..., key=...)`` collects it.
        """
        txy, tvalid, tids = self._pack_tracked(tracked_xy, track_ids)
        d_txy, d_tvalid = self._tracked_device(txy, tvalid)
        out = _extract_impl(jnp.asarray(image), d_txy, d_tvalid, self._spec)
        # start the device->host copy as soon as the computation finishes so
        # the later collect's device_get is (nearly) free — on tunnel-attached
        # TPUs this hides the full ~30 ms round trip behind host work
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except Exception:  # platform without async copies: get pays later
                break
        self._pending[key] = (out, tids)

    @timed
    def detect_and_extract(self, image: np.ndarray,
                           tracked_xy: Optional[np.ndarray] = None,
                           track_ids: Optional[np.ndarray] = None,
                           key=None) -> FrontendResult:
        """Run the fused front-end for one frame (or collect a prefetch).

        ``tracked_xy``: (K, 2) full-res positions of LK-tracked features,
        ``track_ids``: (K,) their odometry track ids. K <= max_tracked.
        """
        pending = self._pending.pop(key, None) if key is not None else None
        if pending is not None:
            out, tids = pending
        else:
            txy, tvalid, tids = self._pack_tracked(tracked_xy, track_ids)
            d_txy, d_tvalid = self._tracked_device(txy, tvalid)
            out = _extract_impl(jnp.asarray(image), d_txy, d_tvalid, self._spec)
            # start the host copy NOW: a device_get that has to initiate the
            # copy itself pays a full protocol round trip on top of compute
            for leaf in jax.tree_util.tree_leaves(out):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    break
        pts, octv, ang, desc, valid, words = jax.device_get(out)
        return FrontendResult(np.asarray(pts), np.asarray(octv), np.asarray(ang),
                              np.asarray(desc), np.asarray(valid), tids,
                              np.asarray(words))
