"""On-device compile gate for Pallas kernels.

Round-3 postmortem: a Pallas kernel that passes its interpret-mode CPU
tests can still fail Mosaic compilation on the real chip (x64-promoted
index-map literals produced an unlegalizable `(i32, i64)` return and the
official bench crashed). Interpret mode never runs Mosaic, so the only
trustworthy check is compiling the real kernel on the live backend.

This module probes each Pallas kernel ONCE per process (per x64 setting)
by compiling + running it on a tiny input on the default backend. Call
sites consult ``ok(name)`` at trace time and fall back to the pure-XLA
path when the probe failed, so a Mosaic regression degrades performance
instead of killing the run. The reference has no analog (cuSOLVER kernels
ship precompiled); this is the TPU-native equivalent of a driver-level
capability check.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict

import jax

_RESULTS: Dict[tuple, bool] = {}


def _key(name: str) -> tuple:
    return (name, jax.default_backend(), bool(jax.config.jax_enable_x64))


def ok(name: str, probe: Callable[[], None]) -> bool:
    """True iff ``probe`` (a tiny real compile+run of the kernel) succeeds
    on the current default backend. Cached per (kernel, backend, x64)."""
    k = _key(name)
    if k not in _RESULTS:
        try:
            probe()
            _RESULTS[k] = True
        except Exception as e:  # Mosaic legalization errors are generic
            warnings.warn(
                f"Pallas kernel '{name}' failed to compile on backend "
                f"'{k[1]}' (x64={k[2]}); falling back to the XLA path. "
                f"Error: {type(e).__name__}: {str(e)[:300]}"
            )
            _RESULTS[k] = False
    return _RESULTS[k]


def reset() -> None:
    """Drop cached probe results (tests)."""
    _RESULTS.clear()
