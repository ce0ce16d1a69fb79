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
def make_codebook(num_words: int, seed: int = _CODEBOOK_SEED,
                  path: str = "") -> np.ndarray:
    """(V, 8) uint32 binary centroids.

    ``path`` (the reference's ``vocabularyPath`` knob, loaded at
    bow_index.cpp:12-28) names an explicit ``.npz`` with a ``codebook``
    array of exactly ``num_words`` 256-bit rows. When empty, loads the
    in-tree trained vocabulary ``slam_tpu/data/vocab_<V>.npz`` when it
    exists (hierarchical binary k-means over production ORB descriptors,
    `tools/train_vocab.py` — the counterpart of the reference's offline
    DBoW2 vocabulary file); otherwise falls back to deterministic seeded
    random centroids (LSH-style quantizer)."""
    import os
    if not path:
        default = os.path.join(os.path.dirname(__file__), "..", "data",
                               f"vocab_{num_words}.npz")
        if seed == _CODEBOOK_SEED and os.path.exists(default):
            path = default
    if path:
        vocab = np.load(path)["codebook"]
        assert vocab.shape == (num_words, 8) and vocab.dtype == np.uint32, (
            f"vocabulary at {path}: expected ({num_words}, 8) uint32, got "
            f"{vocab.shape} {vocab.dtype} — set bowVocabularySize to match")
        return vocab
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
    """reference: bow_index.{hpp,cpp}

    The retrieval store is an inverted index word -> postings, exactly like
    the reference's ``index[wordId].push_back(mapKf)`` (bow_index.cpp:44-48):
    queries touch only the postings of the query's words (O(total postings of
    query words), independent of the number of indexed keyframes), and
    ``remove`` is an O(1) tombstone. Each posting carries the entry's
    normalized signature weight for that word, so the accumulated score is
    bit-identical to the dense signature dot product."""

    def __init__(self, parameters: ParametersSlam):
        self.parameters = parameters
        self.num_words = parameters.bowVocabularySize
        self.num_groups = parameters.bowFeatureGroups
        assert self.num_words % self.num_groups == 0
        self._group_div = self.num_words // self.num_groups
        self.codebook = make_codebook(self.num_words,
                                      path=parameters.vocabularyPath)
        # inverted index: word -> (entry rows, per-row signature weights)
        self._post_rows: Dict[int, List[int]] = {}
        self._post_weights: Dict[int, List[float]] = {}
        self._entries: List[MapKf] = []       # row id -> MapKf (tombstoned)
        self._alive: List[bool] = []
        self._row_of: Dict[MapKf, int] = {}
        self._n_alive = 0

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
        # SPARSE signature (unique words, L2-normalized weights): a dense
        # 65536-float vector per keyframe would pin ~150 MB at config-5
        # scale while every consumer only reads the entry's own words
        uw, cnt = np.unique(words, return_counts=True)
        cnt = cnt.astype(np.float32)
        n = float(np.linalg.norm(cnt))
        shared.bow_signature = (uw.astype(np.int32),
                                cnt / n if n > 0 else cnt)

    # ------------------------------------------------------------------

    def add(self, keyframe, map_id: MapId) -> None:
        assert keyframe.shared.bow_signature is not None, "transform() first"
        map_kf = MapKf(map_id, keyframe.id)
        # re-registration must not leak the previous row: it would stay
        # alive in every postings list forever (remove only tombstones the
        # newest row for a given MapKf)
        if map_kf in self._row_of:
            self.remove(map_kf)
        row = len(self._entries)
        self._entries.append(map_kf)
        self._alive.append(True)
        self._row_of[map_kf] = row
        self._n_alive += 1
        uw, wt = keyframe.shared.bow_signature
        for w, weight in zip(uw.tolist(), wt.tolist()):
            self._post_rows.setdefault(w, []).append(row)
            self._post_weights.setdefault(w, []).append(weight)

    def remove(self, map_kf: MapKf) -> None:
        row = self._row_of.pop(map_kf, None)
        if row is None:
            return
        self._alive[row] = False
        self._n_alive -= 1
        # amortized cleanup: when most rows are dead, rebuild the postings
        if (len(self._entries) > 64
                and self._n_alive < len(self._entries) // 2):
            self._compact()

    def _compact(self) -> None:
        remap = {}
        entries, alive = [], []
        for row, (e, a) in enumerate(zip(self._entries, self._alive)):
            if a:
                remap[row] = len(entries)
                entries.append(e)
                alive.append(True)
        for w in list(self._post_rows):
            rows = self._post_rows[w]
            weights = self._post_weights[w]
            kept = [(remap[r], wt) for r, wt in zip(rows, weights) if r in remap]
            if kept:
                self._post_rows[w] = [r for r, _ in kept]
                self._post_weights[w] = [wt for _, wt in kept]
            else:
                del self._post_rows[w]
                del self._post_weights[w]
        self._entries = entries
        self._alive = alive
        self._row_of = {e: i for i, e in enumerate(entries)}

    def __len__(self) -> int:
        return self._n_alive

    @staticmethod
    def score(a_shared, b_shared) -> float:
        """Cosine similarity of two keyframes' sparse BoW signatures (the
        quantity get_bow_similar accumulates per candidate; exposed for
        gate-margin analysis, e.g. tools/eval_vocab_transfer.py)."""
        aw, av = a_shared.bow_signature
        bw, bv = b_shared.bow_signature
        ia = {int(w): float(v) for w, v in zip(aw.tolist(), av.tolist())}
        return float(sum(ia.get(int(w), 0.0) * float(v)
                         for w, v in zip(bw.tolist(), bv.tolist())))

    # ------------------------------------------------------------------

    @timed
    def get_bow_similar(self, map_db: MapDB, atlas, kf) -> List[BowSimilar]:
        """Candidate keyframes for loop closure / relocation
        (reference: bow_index.cpp:95-176). One pass over the postings of the
        query's words accumulates both words-in-common counts and signature
        dot products; gating then follows the reference contract exactly
        (strict > on the in-common ratio, >= on the score ratio)."""
        if self._n_alive == 0:
            return []
        current = MapKf(CURRENT_MAP_ID, kf.id)
        q_words, q_wt = kf.shared.bow_signature

        n_rows = len(self._entries)
        # one C-speed pass over the postings of the query's words: bincount
        # accumulates both the words-in-common counts and the signature dot
        # products (sum over shared words of q_sig[w] * entry_sig[w])
        from itertools import chain
        rows_lists, weight_lists, q_factors, lens = [], [], [], []
        for w, qv in zip(q_words.tolist(), q_wt.tolist()):
            rows = self._post_rows.get(w)
            if not rows:
                continue
            rows_lists.append(rows)
            weight_lists.append(self._post_weights[w])
            q_factors.append(float(qv))
            lens.append(len(rows))
        if not rows_lists:
            return []
        total = sum(lens)
        cat_rows = np.fromiter(chain.from_iterable(rows_lists), np.int64, total)
        cat_w = np.fromiter(chain.from_iterable(weight_lists), np.float64, total)
        qf = np.repeat(np.asarray(q_factors), lens)
        counts = np.bincount(cat_rows, minlength=n_rows)
        scores = np.bincount(cat_rows, weights=qf * cat_w, minlength=n_rows)

        live = np.asarray(self._alive, bool)
        cur_row = self._row_of.get(current)
        if cur_row is not None:
            live = live.copy()
            live[cur_row] = False
        counts = np.where(live, counts, 0)

        max_in_common = int(counts.max()) if n_rows else 0
        if max_in_common == 0:
            return []
        min_in_common = int(self.parameters.bowMinInCommonRatio * max_in_common)

        cand = np.flatnonzero(counts > min_in_common)
        similar = [BowSimilar(self._entries[i], float(scores[i])) for i in cand]
        if not similar:
            return []
        similar.sort(key=lambda x: -x.score)
        min_score = similar[0].score * self.parameters.bowScoreRatio
        return [s for s in similar if s.score >= min_score]
