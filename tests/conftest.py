"""Test configuration: run everything on a virtual 8-device CPU mesh.

The surrounding environment may pre-register a TPU backend (and pin
JAX_PLATFORMS) via sitecustomize before pytest starts, so we both override
the env var and update the latched jax config. Sharding/collective tests need
multiple devices; kernels are written for TPU but execute identically (modulo
speed) on the CPU backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already have been imported (sitecustomize) with the env-latched
# platform; update the live config before any backend is used.
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration tests")
