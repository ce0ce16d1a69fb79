"""Device-mesh helpers for multi-chip scaling.

The reference is a single-process shared-memory system with no distributed
parallelism (SURVEY.md §2 parallelism inventory); a single chip covers its
workload. Multi-chip operation in this framework is therefore an *optional
batch axis*: embarrassingly parallel work — frames of different sequences,
RANSAC hypotheses, BA residual blocks — is sharded over a
``jax.sharding.Mesh`` and XLA inserts the (trivial) collectives. There is no
cross-device map state: the map lives on host, devices hold dense batches.

Axes:
  - ``data``: batch of frames / sequences (offline multi-sequence mapping,
    batched server-style front-end);
  - ``hyp``: RANSAC hypothesis banks (model-parallel-style axis for the
    many-hypothesis solvers).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None,
              backend: Optional[str] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With two axis names and no explicit shape, devices are split as evenly as
    possible between the axes (e.g. 8 -> (4, 2)). When the default backend
    has too few devices, the (virtual multi-device) CPU backend is used.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices and backend is None:
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}; set "
        "XLA_FLAGS=--xla_force_host_platform_device_count")
    devices = devices[:n_devices]
    if shape is None:
        if len(axis_names) == 1:
            shape = (n_devices,)
        elif len(axis_names) == 2:
            hyp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
            shape = (n_devices // hyp, hyp)
        else:
            raise ValueError("give an explicit shape for >2 axes")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading dim is the batch axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place a host array with its leading dimension sharded over ``axis``."""
    return jax.device_put(x, batch_sharding(mesh, axis))
