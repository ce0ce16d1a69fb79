"""Pallas TPU kernels for descriptor operations.

``hamming_argmin`` fuses Hamming distance against a codebook with the argmin
reduction — the vocabulary-quantization step of the retrieval front-end
(`ops/bow.py`). The XLA path materializes the full (N, V) distance matrix in
HBM before reducing; the Pallas kernel streams codebook tiles through VMEM
and keeps only the running (best, argmin) per descriptor, so HBM traffic is
O(N + V) instead of O(N*V).

Popcount uses the same parallel bit-counting identity as the reference
(openvslam/match_base.h:18-39), and the running min packs (distance, index)
into one sortable key so tie-breaking is deterministically first-match like
``np.argmin``. Verified bit-correct compiled on TPU v5e.

When to use: pipelines whose descriptors already live on device (batched
multi-sequence mapping) or very large (N, V). For the single-frame host
pipeline the native C++ popcount path wins below several million pairs once
dispatch latency is counted, so `ops/bow.py` does not default to this
kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128   # descriptors per grid step
TILE_V = 128   # codebook entries per grid step


def _popcount32(v):
    """Parallel bit count (match_base.h bit-hack) on int32 lanes.

    Mosaic's vector ops prefer int32; shifts use the explicit logical form so
    sign bits never leak in.
    """
    shr = jax.lax.shift_right_logical
    m1 = jnp.int32(0x55555555)
    m2 = jnp.int32(0x33333333)
    m3 = jnp.int32(0x0F0F0F0F)
    v = v - (shr(v, 1) & m1)
    v = (v & m2) + (shr(v, 2) & m2)
    v = (v + shr(v, 4)) & m3
    # per-byte counts <= 8: sum via multiply-shift stays within int32
    return shr(v * jnp.int32(0x01010101), 24) & jnp.int32(0xFF)


def _hamming_argmin_kernel(num_words_ref, desc_ref, code_ref, key_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    num_words = num_words_ref[0]

    # (TILE_N, TILE_V) distances accumulated word by word on the VPU
    dist = jnp.zeros((TILE_N, TILE_V), jnp.int32)
    for k in range(8):
        a = desc_ref[:, k][:, None]          # (TILE_N, 1)
        b = code_ref[:, k][None, :]          # (1, TILE_V)
        dist = dist + _popcount32(a ^ b)
    # pack (distance, codebook index) into one sortable key so the running
    # min is deterministic FIRST-match, like np.argmin. dist <= 256 and
    # V <= 65536 keep the key exact in int32.
    col = (jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_V), 1)
           + j * TILE_V)
    key = dist * num_words + col
    # Mosaic's reductions prefer float32; keys < 2^24 stay exact
    tile_key = jnp.min(key.astype(jnp.float32), axis=1).astype(jnp.int32)

    # output keeps the FULL (tiles, TILE_N) array resident in VMEM (constant
    # index map); each N-tile writes its own row across the V sweep
    @pl.when(j == 0)
    def _():
        key_ref[i, :] = tile_key

    @pl.when(j > 0)
    def _():
        key_ref[i, :] = jnp.minimum(tile_key, key_ref[i, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hamming_argmin_call(desc, codebook, interpret=False):
    n = desc.shape[0]
    v = codebook.shape[0]
    grid = (n // TILE_N, v // TILE_V)
    num_words = jnp.full((1,), v, jnp.int32)
    key = pl.pallas_call(
        _hamming_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n // TILE_N, TILE_N), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // TILE_N, TILE_N), jnp.int32),
        interpret=interpret,
    )(num_words, desc, codebook)
    key = key.reshape(-1)
    return key // v, key % v


def hamming_argmin(descriptors: np.ndarray, codebook: np.ndarray,
                   interpret: bool = False):
    """(N, 8) x (V, 8) uint32 -> (dist (N,), argmin (N,)) int32.

    N is padded to TILE_N internally; V must be a multiple of TILE_V (the
    retrieval codebook sizes are powers of two >= 1024).
    """
    n = len(descriptors)
    v = len(codebook)
    assert v % TILE_V == 0, v
    pn = max(TILE_N, ((n + TILE_N - 1) // TILE_N) * TILE_N)
    d = np.zeros((pn, 8), np.uint32)
    d[:n] = descriptors
    # the kernel works on int32 lanes; bit patterns are preserved by the view
    best, idx = _hamming_argmin_call(
        jnp.asarray(d.view(np.int32)),
        jnp.asarray(np.ascontiguousarray(codebook, np.uint32).view(np.int32)),
        interpret=interpret)
    return np.asarray(best)[:n], np.asarray(idx)[:n]


def pallas_available() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
