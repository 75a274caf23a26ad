"""Checkpoint / resume helpers.

The reference supports warm starts only (X/y/S/sig into init,
re-entrant solve; reference: src/solver.cu:125-141, :385-409) with no
mid-run serialization. Here the solver state is a plain pytree, so a
checkpoint is just the unscaled iterates + sigma; resuming is a warm
start. These helpers standardize the file format (.npz).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def save_checkpoint(path: str, result_or_state, sig: Optional[float] = None) -> None:
    """Save unscaled (X, y, S, sig) from an SDPResult (or any object with
    .X/.y/.S and .sig)."""
    X = np.asarray(result_or_state.X)
    y = np.asarray(result_or_state.y)
    S = np.asarray(result_or_state.S)
    s = float(sig if sig is not None else getattr(result_or_state, "sig", 1.0))
    np.savez_compressed(path, X=X, y=y, S=S, sig=s)


def load_checkpoint(path: str):
    """Returns dict(X0=..., y0=..., S0=..., sig=...) ready to splat into
    SDPSolver.solve(**ckpt)."""
    with np.load(path) as z:
        return dict(X0=z["X"], y0=z["y"], S0=z["S"], sig=float(z["sig"]))
