"""Hamming distance between 256-bit ORB descriptors as an MXU GEMM.

Rebuild of the reference's per-pair bit-hack popcount
(reference: openvslam/match_base.h:18-39 ``compute_descriptor_distance_32``)
as a *full-matrix* operation: with descriptors unpacked to ±1 int8 vectors,

    hamming(a, b) = (256 - <a_pm1, b_pm1>) / 2

so an entire N x M distance matrix is one int8 matmul on the MXU — this
replaces both the scalar distance function and the BoW-bucket iteration
pattern (keyframe_matcher.cpp) whose purpose on CPU was to avoid exactly this
O(N*M) scan. On TPU the dense scan *is* the fast path.

A ``population_count``-based path is kept as the independent reference for
tests and for tiny host-side queries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HAMMING_DIST_THR_LOW = 50    # reference: match_base.h:13
HAMMING_DIST_THR_HIGH = 100  # reference: match_base.h:14
MAX_HAMMING_DIST = 256       # reference: match_base.h:15


def unpack_bits_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) int8 in {-1, +1} (bit LSB-first per word)."""
    n = desc.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm1 = (bits.astype(jnp.int8) * 2 - 1)
    return pm1.reshape(n, 256)


@jax.jit
def hamming_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 descriptors -> (N, M) int32 Hamming distances."""
    a = unpack_bits_pm1(desc1)
    b = unpack_bits_pm1(desc2)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (256 - dot) // 2


@jax.jit
def hamming_matrix_popcount(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Reference path: XOR + population_count (exact same results)."""
    x = desc1[:, None, :] ^ desc2[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


MASK_DIST = 10_000  # sentinel distance for gated-out pairs (> any Hamming)


def mutual_nn(dist: jnp.ndarray, thr: int, ratio: float = 1.0):
    """Mutual-nearest selection over a gated (A, B) distance matrix.

    The shared device-side acceptance rule of the batched matchers
    (multichip pair matching, device-VO map matching and landmark
    creation): per-row nearest neighbor, mutual-consistency check, and an
    absolute distance threshold. Gated-out pairs must carry ``MASK_DIST``.

    ``ratio < 1`` adds the Lowe second-best test (best < ratio * second,
    the reference's loopClosureFeatureMatchLoweRatio gate,
    keyframe_matcher.cpp:50-158): on repeating textures a near-tie between
    candidates means the association is ambiguous and must be dropped — a
    wrong match accepted here poisons multi-frame observation stores for
    the whole window. Rows with no second candidate (second = MASK_DIST)
    pass, like the reference's empty-bucket case.

    Returns (nn_ab (A,) int, ok (A,) bool)."""
    nn_ab = jnp.argmin(dist, axis=1)
    nn_ba = jnp.argmin(dist, axis=0)
    d_best = jnp.min(dist, axis=1)
    mutual = nn_ba[nn_ab] == jnp.arange(dist.shape[0])
    ok = mutual & (d_best <= thr)
    if ratio < 1.0:
        neg2, _ = jax.lax.top_k(-dist, 2)           # two smallest distances
        d_second = -neg2[:, 1]
        ok = ok & (d_best.astype(jnp.float32)
                   < ratio * d_second.astype(jnp.float32))
    return nn_ab, ok


def hamming_distance(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Host-side scalar/vector Hamming distance (NumPy popcount)."""
    d1 = np.asarray(d1, dtype=np.uint32)
    d2 = np.asarray(d2, dtype=np.uint32)
    x = (d1 ^ d2).view(np.uint8)
    return np.unpackbits(x, axis=-1).sum(axis=-1, dtype=np.int32)


@functools.lru_cache(maxsize=1)
def _popcount_table() -> np.ndarray:
    return np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.int32)


def hamming_matrix_host(desc1: np.ndarray, desc2: np.ndarray) -> np.ndarray:
    """Host NumPy N x M distance matrix (for small problems / tests)."""
    # ascontiguousarray: device_get of a sliced device buffer can hand back
    # non-contiguous rows, and .view(uint8) requires a contiguous last axis
    a = np.ascontiguousarray(desc1, np.uint32).view(np.uint8).reshape(
        len(desc1), 32)
    b = np.ascontiguousarray(desc2, np.uint32).view(np.uint8).reshape(
        len(desc2), 32)
    t = _popcount_table()
    out = np.zeros((len(a), len(b)), dtype=np.int32)
    for k in range(32):
        out += t[(a[:, None, k] ^ b[None, :, k])]
    return out
