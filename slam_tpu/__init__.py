"""slam_tpu — a TPU-native (JAX/XLA/Pallas) visual-inertial SLAM framework.

A ground-up rebuild of the capabilities of the AaltoML SLAM-module reference
(an OpenVSLAM-derived, odometry-prior-driven keyframe SLAM backend), designed
TPU-first:

  - ORB front-end (image pyramid, corner detection, oriented rotated-BRIEF)
    as fused batched XLA/Pallas kernels (`slam_tpu.ops.pyramid`,
    `slam_tpu.ops.detector`, `slam_tpu.ops.orb`);
  - descriptor matching as int8 popcount-GEMMs on the MXU
    (`slam_tpu.ops.hamming`, `slam_tpu.ops.matching`);
  - many-hypothesis vmapped RANSAC for essential-matrix and Sim3/rot-z
    estimation (`slam_tpu.ops.ransac`);
  - pose-only / local / global bundle adjustment as a Schur-complement
    Levenberg-Marquardt solve in XLA (`slam_tpu.ops.ba`);
  - host-side map database, keyframe pipeline, loop closure, relocation and
    serialization reproducing the reference semantics (`slam_tpu.map`,
    `slam_tpu.pipeline`);
  - optional multi-chip scaling over a `jax.sharding.Mesh`
    (`slam_tpu.parallel`).

See SURVEY.md at the repo root for the layer-by-layer mapping to the
reference implementation.
"""

from slam_tpu.ids import KfId, MpId, KpId, TrackId, MapId, CURRENT_MAP_ID
from slam_tpu.params import Parameters, ParametersSlam, StaticSettings

__version__ = "0.1.0"
