"""Seeded LSH hash families.

Same two schemes as the reference (src/algorithms/lsh.py):
- sign random projection (cosine): bit_i = [P_i·v ≥ 0], bucket =
  Σ bit_i·2^i per table (reference: lsh.py:78-80,196-204).  Collision
  guarantee for two vectors at angle θ: P[collide in ≥1 of T tables]
  = 1−(1−(1−θ/π)^h)^T (reference docstring lsh.py:31-39) — carries
  over unchanged since the hash family is identical.
- E2LSH (L2): h = floor((P·v + b)/w) per projection, bucket = the
  joined tuple (Datar et al. 2004; reference: lsh.py:82-84,206-217).

Projection tensors are generated ONCE on the driver from a seeded
``numpy.random.RandomState`` and broadcast — the reference's exact
reproducibility requirement (SURVEY.md §7.4#3).

Buckets are serialized as strings so an external SQL oracle can
recompute them with plain arithmetic.
"""

from __future__ import annotations

import numpy as np


def make_projections(
    dim: int, num_tables: int, hash_size: int, seed: int
) -> np.ndarray:
    """(num_tables, hash_size, dim) float64 Gaussian projections."""
    rng = np.random.RandomState(seed)
    return rng.randn(num_tables, hash_size, dim)


def make_offsets(num_tables: int, hash_size: int, width: float, seed: int) -> np.ndarray:
    """E2LSH uniform offsets b ∈ [0, w) — (num_tables, hash_size)."""
    rng = np.random.RandomState(seed + 1)
    return rng.uniform(0.0, width, size=(num_tables, hash_size))


def sign_buckets(vecs: np.ndarray, projections: np.ndarray) -> np.ndarray:
    """(n, num_tables) int64 sign-hash buckets."""
    n_tables, hash_size, _ = projections.shape
    v = vecs.astype(np.float64)
    out = np.zeros((v.shape[0], n_tables), dtype=np.int64)
    weights = (1 << np.arange(hash_size)).astype(np.int64)
    for t in range(n_tables):
        bits = (v @ projections[t].T) >= 0.0
        out[:, t] = bits @ weights
    return out


def e2lsh_buckets(
    vecs: np.ndarray, projections: np.ndarray, offsets: np.ndarray, width: float
) -> np.ndarray:
    """(n, num_tables) object array of '_'-joined floor-bucket strings."""
    n_tables = projections.shape[0]
    v = vecs.astype(np.float64)
    out = np.empty((v.shape[0], n_tables), dtype=object)
    for t in range(n_tables):
        h = np.floor((v @ projections[t].T + offsets[t]) / width).astype(np.int64)
        out[:, t] = ["_".join(map(str, row)) for row in h]
    return out
