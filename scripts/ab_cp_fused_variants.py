"""Interleaved A/B over the FUSED partitioned (nofastpath) cluster-pruned
plan: emission clip on/off x scan-stage width x merge strategy.

Bench config replica (20k x 64-d, nlist=64, nprobe=8, 2048 queries,
k=20, broadcast + /dev/shm fast paths disabled).  All variants verify
result parity against the broadcast fast path before timing; every rep
interleaves all variants so they sample the same interference windows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_retrieval_spark.session import get_spark
from vectordb_retrieval_spark.sources.random_gen import random_vectors
from vectordb_retrieval_spark.operators import cluster_pruned as cp_mod
from vectordb_retrieval_spark.operators.cluster_pruned import (
    ClusterPrunedExactIndexer,
    ClusterPrunedExactSearcher,
)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-cp-fused-variants")
    base = random_vectors(spark, 20_000, 64, seed=7, stream=1).cache()
    base.count()
    q = random_vectors(spark, 2048, 64, seed=7, stream=3, id_col="qid").cache()
    q.count()
    art = ClusterPrunedExactIndexer(
        nlist=64, seed=7, max_iter=10, init_mode="k-means||"
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    fast = (
        ClusterPrunedExactSearcher(nprobe=8)
        .attach(art)
        .search(q, 20, qid_col="qid", vec_col="vec")
        .select("qid", "id", "rank")
        .collect()
    )
    fast_key = sorted(map(tuple, fast))
    print(f"fast path reference: {len(fast)} rows")

    orig_scan = cp_mod.cluster_scan_topk
    orig_tasks = cp_mod._scan_tasks
    orig_merge = cp_mod.merge_fragment_topk

    def noclip_scan(*a, **kw):
        kw.pop("qbounds", None)
        return orig_scan(*a, **kw)

    def numpy_merge(frag, k, n_queries=None):
        return orig_merge(frag, k, n_queries=None)

    def searcher():
        art.params.pop("_serving_bc", None)
        return ClusterPrunedExactSearcher(
            nprobe=8, broadcast_threshold=0, node_local_cache=False
        ).attach(art)

    # (name, scan_fn, tasks_fn, merge_fn)
    variants = [
        ("noclip_t32_jvm", noclip_scan, orig_tasks, orig_merge),
        ("clip_t32_jvm", orig_scan, orig_tasks, orig_merge),
        ("clip_t16_jvm", orig_scan, lambda n: 16, orig_merge),
        ("clip_t8_jvm", orig_scan, lambda n: 8, orig_merge),
        ("clip_t32_np", orig_scan, orig_tasks, numpy_merge),
        ("noclip_t8_jvm", noclip_scan, lambda n: 8, orig_merge),
    ]

    def run(scan_fn, tasks_fn, merge_fn):
        cp_mod.cluster_scan_topk = scan_fn
        cp_mod._scan_tasks = tasks_fn
        cp_mod.merge_fragment_topk = merge_fn
        try:
            return searcher().search(q, 20, qid_col="qid", vec_col="vec")
        finally:
            cp_mod.cluster_scan_topk = orig_scan
            cp_mod._scan_tasks = orig_tasks
            cp_mod.merge_fragment_topk = orig_merge

    # parity for every variant, then warm
    for name, *fns in variants:
        got = sorted(
            map(tuple, run(*fns).select("qid", "id", "rank").collect())
        )
        assert got == fast_key, f"parity failed: {name}"
    print("parity OK for all variants")

    mins = {name: float("inf") for name, *_ in variants}
    for rep in range(6):
        for name, *fns in variants:
            df = run(*fns)
            t0 = time.time()
            materialize(df.select("qid", "id"))
            dt = time.time() - t0
            mins[name] = min(mins[name], dt)
            print(f"rep{rep} {name}: {dt:.3f}s", flush=True)
    print("--- mins ---")
    for name, *_ in variants:
        t = mins[name]
        print(f"{name}: {t:.3f}s  {2048 / t:,.0f} QPS")


if __name__ == "__main__":
    main()
