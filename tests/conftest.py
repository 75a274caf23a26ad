"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver invokes ``python -m pytest tests/ -x -q`` with the ambient
environment pointing JAX at the (single, remote) TPU chip. Tests must be
hermetic and exercise multi-device sharding, so we force the host CPU
platform with 8 virtual devices and enable x64 (the solver is float64 by
default, mirroring the reference's end-to-end double precision --
/root/reference/src/solver.cu is pure f64).
"""

import os

# Must be set before the first jax import in this process.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# The axon sitecustomize registers a remote-TPU PJRT plugin at interpreter
# startup and pins jax_platforms; override it after import (this works even
# when the env var JAX_PLATFORMS=axon is set).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
