"""Standalone (no-Spark) profiler for the graph beam kernel.

Replicates the bench random workload (20k x 64-d Gaussian, 8 shards,
m=12, ef=24, 16384 queries in 128-query chunks) and reports where the
beam kernel's wall time goes.  Shards by id % 8 instead of xxhash64 —
statistically identical on Gaussian data.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vectordb_retrieval_spark.operators.graph_ann import (  # noqa: E402
    _batched_beam,
    _build_nsw,
    _pad_adjacency,
)


def gen(n, dim, seed, stream):
    out = np.empty((n, dim), dtype=np.float32)
    for i in range(n):
        out[i] = np.random.Generator(
            np.random.Philox(np.random.SeedSequence([seed, stream, i]))
        ).standard_normal(dim, dtype=np.float32)
    return out


def main():
    n, dim, n_shards, m, ef, chunk = 20_000, 64, 8, 12, 24, 128
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384
    t0 = time.time()
    base = gen(n, dim, 7, 0)
    qmat = gen(n_q, dim, 7, 2)
    print(f"gen: {time.time()-t0:.2f}s")

    ids = np.arange(n)
    shards = []
    t0 = time.time()
    for s in range(n_shards):
        mask = ids % n_shards == s
        mat = base[mask]
        padj = _pad_adjacency(_build_nsw(mat, m, 32, "l2"))
        shards.append((ids[mask], mat, padj))
    print(f"build: {time.time()-t0:.2f}s")

    # warm
    for _, mat, padj in shards:
        _batched_beam(mat, padj, qmat[:chunk], ef, "l2")

    t0 = time.time()
    calls = 0
    for _, mat, padj in shards:
        for qs in range(0, n_q, chunk):
            _batched_beam(mat, padj, qmat[qs : qs + chunk], ef, "l2")
            calls += 1
    wall = time.time() - t0
    print(
        f"beam total (1 thread): {wall:.3f}s over {calls} calls "
        f"-> {n_q/ (wall/1):.0f} q/s-equivalent serial; "
        f"32-core ideal qps ~ {32*n_q/wall:.0f}"
    )

    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    for _, mat, padj in shards:
        for qs in range(0, 2048, chunk):
            _batched_beam(mat, padj, qmat[qs : qs + chunk], ef, "l2")
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
