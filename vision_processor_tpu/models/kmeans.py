"""Guarded 2-means over small color sets (host-side, integer vectors).

Reference semantics (reference src/blobs/kmeans.cpp:20-90): refuse to split
when the tightest in-group pair is looser than the contrast distance, seed
centers from the nearest members, restore the previous centers when the
result degenerates or the split is weaker than half the contrast distance.
Integer division semantics are preserved.
"""
from __future__ import annotations

import numpy as np


def kmeans2(
    contrast: np.ndarray, values: list[np.ndarray], c1: np.ndarray, c2: np.ndarray
) -> tuple[bool, np.ndarray, np.ndarray]:
    """Returns (updated, c1, c2); inputs are int vectors, not mutated."""
    c1 = np.asarray(c1, dtype=np.int64)
    c2 = np.asarray(c2, dtype=np.int64)
    if len(values) < 2:
        return False, c1, c2
    vals = np.asarray(values, dtype=np.int64)
    contrast = np.asarray(contrast, dtype=np.int64)

    out_group = np.min(np.sum((vals - contrast) ** 2, axis=-1))
    d = vals[:, None, :] - vals[None, :, :]
    pair = np.sum(d * d, axis=-1)
    np.fill_diagonal(pair, np.iinfo(np.int64).max)  # exclude self-pairs
    in_group = np.min(pair)

    if in_group > out_group:
        return False, c1, c2

    backup1, backup2 = c1.copy(), c2.copy()
    c1 = vals[np.argmin(np.sum((vals - c1) ** 2, axis=-1))].copy()
    c2 = vals[np.argmin(np.sum((vals - c2) ** 2, axis=-1))].copy()
    if np.array_equal(c1, c2):
        return False, backup1, backup2

    old1, old2 = c2.copy(), c1.copy()
    while not (np.array_equal(old1, c1) or np.array_equal(old2, c2)):
        assign1 = np.sum((vals - c1) ** 2, axis=-1) < np.sum(
            (vals - c2) ** 2, axis=-1
        )
        n1 = int(assign1.sum())
        n2 = len(vals) - n1
        if n1 == 0 or n2 == 0:
            return False, backup1, backup2
        old1, old2 = c1, c2
        # integer division like Eigen Vector3i / int
        c1 = vals[assign1].sum(axis=0) // n1
        c2 = vals[~assign1].sum(axis=0) // n2

    if np.linalg.norm(c1 - c2) < np.sqrt(out_group) / 2.0:
        return False, backup1, backup2

    return True, c1, c2
