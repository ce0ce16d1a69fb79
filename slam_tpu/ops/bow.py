"""Place recognition: batched descriptor quantization replacing DBoW2.

The reference uses a DBoW2 ORB vocabulary tree (~10^6 words, 6 levels, k=10)
loaded from disk, an inverted index, and L1 BoW scoring (reference:
bow_index.cpp). A CPU vocabulary *tree* exists to make quantization cheap; on
TPU the dense alternative is faster and simpler:

  - a deterministic codebook of V 256-bit centroids (seeded random bits — an
    LSH-style quantizer; no vocabulary file needed),
  - quantization of all keypoint descriptors against the whole codebook with
    ONE Hamming GEMM (`ops/hamming.py`) + argmin,
  - per-keyframe retrieval signature = L2-normalized word histogram; keyframe
    similarity = signature dot product, evaluated against every indexed
    keyframe as a single GEMV.

The DBoW2 ``FeatureVector`` (node buckets at levelsUp=4, ~100 groups,
bow_index.cpp:82-92) maps to ``groups`` = the top bits of the word id, giving
the same candidate-restriction semantics for the bucketed matchers.

``get_bow_similar`` reproduces the reference's candidate selection contract
(bow_index.cpp:95-176): words-in-common gating relative to the best match,
then score gating relative to the best score.
"""
from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional

import numpy as np

from slam_tpu.ids import KfId, MapId, CURRENT_MAP_ID
from slam_tpu.map.mapdb import MapDB, MapKf
from slam_tpu.params import ParametersSlam
from slam_tpu.utils.timer import timed

_CODEBOOK_SEED = 94235682  # deterministic, nod to random_array.cc:21


class BowSimilar(NamedTuple):
    """reference: bow_index.hpp:31-34"""
    map_kf: MapKf
    score: float


@functools.lru_cache(maxsize=4)
def make_codebook(num_words: int, seed: int = _CODEBOOK_SEED) -> np.ndarray:
    """(V, 8) uint32 random binary centroids."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2 ** 32, size=(num_words, 8), dtype=np.uint32)


def quantize(descriptors: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """Nearest-centroid word ids for (N, 8) descriptors via Hamming GEMM.

    N is padded to a fixed bucket so one compiled kernel serves all keyframes
    regardless of keypoint count."""
    n = len(descriptors)
    if n == 0:
        return np.zeros(0, np.int32)
    from slam_tpu import native
    threshold = (1 << 23) if native.available() else (1 << 18)
    if n * len(codebook) >= threshold:
        import jax.numpy as jnp
        from slam_tpu.ops.hamming import hamming_matrix
        pn = max(256, ((n + 255) // 256) * 256)
        d = np.zeros((pn, 8), np.uint32)
        d[:n] = descriptors
        dist = np.asarray(hamming_matrix(jnp.asarray(d),
                                         jnp.asarray(codebook)))[:n]
        return np.argmin(dist, axis=1).astype(np.int32)
    words = native.hamming_argmin(descriptors, codebook)
    if words is not None:
        return words
    dist = native.hamming_matrix(descriptors, codebook)
    return np.argmin(dist, axis=1).astype(np.int32)


class BowIndex:
    """reference: bow_index.{hpp,cpp}"""

    def __init__(self, parameters: ParametersSlam):
        self.parameters = parameters
        self.num_words = parameters.bowVocabularySize
        self.num_groups = parameters.bowFeatureGroups
        assert self.num_words % self.num_groups == 0
        self._group_div = self.num_words // self.num_groups
        self.codebook = make_codebook(self.num_words)
        # retrieval store: signature matrix rows + keyframe list
        self._entries: List[MapKf] = []
        self._signatures: List[np.ndarray] = []
        self._words: List[np.ndarray] = []  # sorted unique word ids per entry

    # ------------------------------------------------------------------

    @timed
    def transform(self, shared) -> None:
        """Fill words/groups/signature of a KeyframeShared
        (equivalent of BowIndex::transform, bow_index.cpp:59-93). Reuses
        words already quantized on-device by the fused front-end (identical
        integer distances + first-min tie-breaking) when present."""
        n = len(shared.descriptors)
        if (shared.words is not None and len(shared.words) == n and n > 0):
            words = np.asarray(shared.words, np.int32)
        else:
            words = quantize(shared.descriptors, self.codebook)
        shared.words = words
        shared.groups = (words // self._group_div).astype(np.int32)
        sig = np.bincount(words, minlength=self.num_words).astype(np.float32)
        n = np.linalg.norm(sig)
        shared.bow_signature = sig / n if n > 0 else sig

    # ------------------------------------------------------------------

    def add(self, keyframe, map_id: MapId) -> None:
        assert keyframe.shared.bow_signature is not None, "transform() first"
        self._entries.append(MapKf(map_id, keyframe.id))
        self._signatures.append(keyframe.shared.bow_signature)
        self._words.append(np.unique(keyframe.shared.words))

    def remove(self, map_kf: MapKf) -> None:
        for i, e in enumerate(self._entries):
            if e == map_kf:
                del self._entries[i]
                del self._signatures[i]
                del self._words[i]
                return

    def __len__(self) -> int:
        return len(self._entries)

    # ------------------------------------------------------------------

    def get_bow_similar(self, map_db: MapDB, atlas, kf) -> List[BowSimilar]:
        """Candidate keyframes for loop closure / relocation
        (reference: bow_index.cpp:95-176)."""
        if not self._entries:
            return []
        current = MapKf(CURRENT_MAP_ID, kf.id)
        q_words = np.unique(kf.shared.words)
        q_sig = kf.shared.bow_signature

        in_common = np.array([
            0 if e == current else len(np.intersect1d(q_words, w, assume_unique=True))
            for e, w in zip(self._entries, self._words)])
        max_in_common = int(in_common.max()) if len(in_common) else 0
        if max_in_common == 0:
            return []
        min_in_common = int(self.parameters.bowMinInCommonRatio * max_in_common)

        sig_matrix = np.stack(self._signatures)
        scores = sig_matrix @ q_sig

        similar = [BowSimilar(e, float(s))
                   for e, s, c in zip(self._entries, scores, in_common)
                   if c > min_in_common and e != current]
        if not similar:
            return []
        similar.sort(key=lambda x: -x.score)
        min_score = similar[0].score * self.parameters.bowScoreRatio
        return [s for s in similar if s.score >= min_score]
