"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via ``bench.py``; unit/parity tests run on CPU
so sharding logic is exercised without multi-chip hardware.  Note the axon
TPU plugin ignores ``JAX_PLATFORMS``, so we force the platform through
``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
