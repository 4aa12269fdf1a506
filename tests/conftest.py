"""Test configuration: force CPU with a virtual 8-device mesh, enable x64.

Multi-device tests exercise real collectives on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
validates the multi-chip path.  x64 is enabled so parity tests can run the
decoders in float64 against the reference's NumPy float64 arithmetic.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The axon sitecustomize exports JAX_PLATFORMS=axon; the config update below
# (not the env var) is what reliably forces the CPU backend for tests.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
