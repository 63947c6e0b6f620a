"""A/B: cluster-pruned PARTITIONED (nofastpath) serving — two-phase vs
fused single-job plan.

Replicates the bench's qps_cluster_pruned_nofastpath_2048q config
(20k x 64-d base, nlist=64, nprobe=8, 2048 queries, k=20, broadcast
and /dev/shm fast paths disabled) and interleaves the two plans so both
sample the same interference windows.  Also verifies result parity
against the broadcast fast path.
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
    spark = get_spark("ab-cp-nofastpath")
    base = random_vectors(spark, 20_000, 64, seed=7, stream=1).cache()
    base.count()
    q = random_vectors(spark, 2048, 64, seed=7, stream=3, id_col="qid").cache()
    q.count()
    art = ClusterPrunedExactIndexer(
        nlist=64, seed=7, max_iter=10, init_mode="k-means||"
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    def nofp_searcher():
        art.params.pop("_serving_bc", None)
        return ClusterPrunedExactSearcher(
            nprobe=8, broadcast_threshold=0, node_local_cache=False
        ).attach(art)

    # parity: fused plan vs broadcast fast path
    fast = (
        ClusterPrunedExactSearcher(nprobe=8)
        .attach(art)
        .search(q, 20, qid_col="qid", vec_col="vec")
        .select("qid", "id", "rank")
        .collect()
    )
    art.params.pop("_serving_bc", None)
    fused = (
        nofp_searcher()
        .search(q, 20, qid_col="qid", vec_col="vec")
        .select("qid", "id", "rank")
        .collect()
    )
    assert sorted(map(tuple, fast)) == sorted(map(tuple, fused)), "parity!"
    print(f"parity OK ({len(fast)} rows)")

    saved = cp_mod.CP_FUSE_EXTRA_FLOPS
    variants = [("two-phase", 0.0), ("fused", saved)]
    mins = {name: float("inf") for name, _ in variants}
    # warm both
    for name, budget in variants:
        cp_mod.CP_FUSE_EXTRA_FLOPS = budget
        s = nofp_searcher()
        materialize(s.search(q, 20, qid_col="qid", vec_col="vec"))
    for rep in range(5):
        for name, budget in variants:
            cp_mod.CP_FUSE_EXTRA_FLOPS = budget
            s = nofp_searcher()
            t0 = time.time()
            materialize(
                s.search(q, 20, qid_col="qid", vec_col="vec").select("qid", "id")
            )
            dt = time.time() - t0
            mins[name] = min(mins[name], dt)
            print(f"rep{rep} {name}: {dt:.3f}s")
    cp_mod.CP_FUSE_EXTRA_FLOPS = saved
    for name, _ in variants:
        t = mins[name]
        print(f"{name}: min {t:.3f}s  {2048 / t:,.0f} QPS")


if __name__ == "__main__":
    main()
