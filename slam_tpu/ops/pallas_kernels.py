"""Pallas TPU kernels for descriptor operations.

``hamming_argmin`` fuses Hamming distance against a codebook with the argmin
reduction — the vocabulary-quantization step of the retrieval front-end
(`ops/bow.py`). The XLA path materializes the full (N, V) distance matrix in
HBM before reducing; the Pallas kernel streams codebook tiles through VMEM
and keeps only the running (best, argmin) per descriptor, so HBM traffic is
O(N + V) instead of O(N*V).

Popcount uses the same parallel bit-counting identity as the reference
(openvslam/match_base.h:18-39). The kernel requires a TPU backend; callers
fall back to the XLA/MXU path elsewhere (selection in `ops/bow.py`).
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
    """Parallel bit count on uint32 (match_base.h bit-hack)."""
    m1 = jnp.uint32(0x55555555)
    m2 = jnp.uint32(0x33333333)
    m3 = jnp.uint32(0x0F0F0F0F)
    m4 = jnp.uint32(0x01010101)
    v = v - ((v >> 1) & m1)
    v = (v & m2) + ((v >> 2) & m2)
    return (((v + (v >> 4)) & m3) * m4) >> 24


def _hamming_argmin_kernel(desc_ref, code_ref, best_ref, idx_ref):
    j = pl.program_id(1)

    # (TILE_N, TILE_V) distances accumulated word by word on the VPU
    dist = jnp.zeros((TILE_N, TILE_V), jnp.uint32)
    for k in range(8):
        a = desc_ref[:, k][:, None]          # (TILE_N, 1)
        b = code_ref[:, k][None, :]          # (1, TILE_V)
        dist = dist + _popcount32(a ^ b)
    dist = dist.astype(jnp.int32)

    tile_best = jnp.min(dist, axis=1)
    tile_arg = jnp.argmin(dist, axis=1).astype(jnp.int32) + j * TILE_V

    @pl.when(j == 0)
    def _():
        best_ref[:] = tile_best
        idx_ref[:] = tile_arg

    @pl.when(j > 0)
    def _():
        prev_best = best_ref[:]
        take = tile_best < prev_best
        best_ref[:] = jnp.where(take, tile_best, prev_best)
        idx_ref[:] = jnp.where(take, tile_arg, idx_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hamming_argmin_call(desc, codebook, interpret=False):
    n = desc.shape[0]
    v = codebook.shape[0]
    grid = (n // TILE_N, v // TILE_V)
    best, idx = pl.pallas_call(
        _hamming_argmin_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ),
        interpret=interpret,
    )(desc, codebook)
    return best, idx


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
    best, idx = _hamming_argmin_call(jnp.asarray(d), jnp.asarray(codebook),
                                     interpret=interpret)
    return np.asarray(best)[:n], np.asarray(idx)[:n]


def pallas_available() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
