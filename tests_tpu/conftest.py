"""Real-hardware test leg (run on the TPU bench chip).

Unlike ``tests/`` (which forces a virtual 8-device CPU mesh), this suite
runs on whatever accelerator the ambient environment provides, under the
SAME config as the official bench (x64 enabled -- bench.py:38): the
round-3 regression shipped precisely because Pallas kernels were only
ever exercised in interpret mode on CPU, where Mosaic never runs.

Usage (documented in README):  python -m pytest tests_tpu/ -q

Each test skips itself when no TPU is attached, so the suite is safe to
invoke from CI that sometimes lacks hardware.
"""

import os

import jax

# Match the bench configuration exactly: x64 on (f64 residual refinement).
jax.config.update("jax_enable_x64", True)

# Persistent compile cache (TPU only): first Mosaic compiles through the
# tunneled compile service take minutes; cached reloads take seconds.
if jax.default_backend() in ("tpu", "axon"):
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest


@pytest.fixture(scope="session")
def tpu():
    """Skip unless a real TPU backend is attached."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU attached (default backend is %s)" % jax.default_backend())
    return jax.devices()[0]
