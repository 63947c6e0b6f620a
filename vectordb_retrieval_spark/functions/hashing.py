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


def sign_multiprobe_buckets(
    vecs: np.ndarray, projections: np.ndarray, n_probes: int
) -> np.ndarray:
    """(n, num_tables, n_probes) int64 probe sequence per query/table:
    the base sign bucket, then single-bit flips in increasing |margin|
    order (multi-probe LSH, Lv et al. VLDB 2007) — the buckets a
    near-boundary query most likely *just missed*.

    Probing p buckets per table trades query-side joins for index
    memory: recall comparable to p× the tables at 1/p the bucket-table
    size, which at 100 TB is the difference between one index copy and
    p copies."""
    n_tables, hash_size, _ = projections.shape
    if not 1 <= n_probes <= hash_size + 1:
        raise ValueError(f"n_probes must be in [1, {hash_size + 1}]")
    v = vecs.astype(np.float64)
    weights = (1 << np.arange(hash_size)).astype(np.int64)
    out = np.zeros((v.shape[0], n_tables, n_probes), dtype=np.int64)
    for t in range(n_tables):
        proj = v @ projections[t].T  # (n, hash_size)
        base = ((proj >= 0.0) @ weights).astype(np.int64)
        order = np.argsort(np.abs(proj), axis=1, kind="stable")
        out[:, t, 0] = base
        for p in range(1, n_probes):
            out[:, t, p] = base ^ weights[order[:, p - 1]]
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


def e2lsh_multiprobe_buckets(
    vecs: np.ndarray,
    projections: np.ndarray,
    offsets: np.ndarray,
    width: float,
    n_probes: int,
) -> np.ndarray:
    """(n, num_tables, n_probes) object strings: the base E2LSH bucket,
    then single-dimension ±1 floor perturbations ordered by distance to
    the crossed boundary (the E2LSH half of multi-probe LSH, Lv et al.
    VLDB 2007).

    For hash dim j with fractional part f_j ∈ [0,1): stepping down
    (−1) crosses a boundary f_j·w away, stepping up (+1) crosses
    (1−f_j)·w away — probes visit the cheapest crossings first."""
    n_tables, hash_size, _ = projections.shape
    if not 1 <= n_probes <= 2 * hash_size + 1:
        raise ValueError(f"n_probes must be in [1, {2 * hash_size + 1}]")
    v = vecs.astype(np.float64)
    out = np.empty((v.shape[0], n_tables, n_probes), dtype=object)
    for t in range(n_tables):
        z = (v @ projections[t].T + offsets[t]) / width  # (n, hash_size)
        h = np.floor(z).astype(np.int64)
        frac = z - h
        # perturbation scores: (dim j, −1) costs frac_j; (dim j, +1)
        # costs 1 − frac_j — concatenate and argsort once per query
        scores = np.concatenate([frac, 1.0 - frac], axis=1)  # (n, 2h)
        order = np.argsort(scores, axis=1, kind="stable")
        for i in range(v.shape[0]):
            base = h[i]
            out[i, t, 0] = "_".join(map(str, base))
            for p in range(1, n_probes):
                sel = order[i, p - 1]
                j, delta = (sel, -1) if sel < hash_size else (sel - hash_size, 1)
                pert = base.copy()
                pert[j] += delta
                out[i, t, p] = "_".join(map(str, pert))
    return out
