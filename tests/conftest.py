"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; real TPU hardware is not
assumed for CI. Kernels are written for TPU but execute identically (modulo
speed) on the CPU backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
