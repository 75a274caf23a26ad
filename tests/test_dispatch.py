"""Calibrated projection dispatch (ops/dispatch.py) -- the analog of the
reference's is_large_mat heuristic derived from its committed sweep
(reference: src/matrix_sizes.cu:14-19, test/output/single_batched_comparison.txt)."""

import json
import os

import numpy as np

from cuadmm_tpu.ops import dispatch


def _write_table(tmp_path, backend, dtype, rows):
    os.makedirs(dispatch._DATA_DIR, exist_ok=True)
    path = os.path.join(dispatch._DATA_DIR, f"eig_sweep_{backend}_{dtype}.jsonl")
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def test_choose_methods_nearest_neighbor(tmp_path):
    rows = [
        {"n": 8, "batch": 64, "eigh_ms": 1.0, "poly_ms": 0.2},
        {"n": 128, "batch": 64, "eigh_ms": 5.0, "poly_ms": 9.0},
        {"n": 512, "batch": 1, "eigh_ms": 50.0, "poly_ms": 20.0},
    ]
    path = _write_table(tmp_path, "faketpu", "float32", rows)
    try:
        out = dispatch.choose_methods(
            [(1, 100), (10, 50), (100, 80), (600, 1)], "faketpu", "float32"
        )
        assert out == {0: "clamp", 1: "poly", 2: "eigh", 3: "poly"}
    finally:
        os.remove(path)


def test_choose_methods_missing_table():
    assert dispatch.choose_methods([(8, 4)], "nosuchbackend", "float32") is None
