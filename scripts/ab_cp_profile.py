"""Stage-level profile of the FUSED partitioned cluster-pruned plan:
scan-only vs scan+merge vs the broadcast fast path, interleaved, plus
fragment-row counts with and without the T'_q emission clip.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_retrieval_spark.session import get_spark
from vectordb_retrieval_spark.sources.random_gen import random_vectors
from vectordb_retrieval_spark.operators import cluster_pruned as cp_mod
from vectordb_retrieval_spark.operators.cluster_pruned import (
    ClusterPrunedExactIndexer,
    ClusterPrunedExactSearcher,
)
from vectordb_retrieval_spark.functions.kernels import (
    cluster_scan_topk,
    merge_fragment_topk,
    packed_assignment_cached,
    query_broadcast_cached,
)
from vectordb_retrieval_spark.functions.distance import pairwise_distances


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-cp-profile")
    base = random_vectors(spark, 20_000, 64, seed=7, stream=1).cache()
    base.count()
    q = random_vectors(spark, 2048, 64, seed=7, stream=3, id_col="qid").cache()
    q.count()
    art = ClusterPrunedExactIndexer(
        nlist=64, seed=7, max_iter=10, init_mode="k-means||"
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    cents = art.params["centroids"]
    radii = np.asarray(art.params["radii"], dtype=np.float64)
    bcq = query_broadcast_cached(q, "qid", "vec")
    qids, qmat = bcq.value
    qc = pairwise_distances(qmat, cents, "l2")
    k, nprobe = 20, 8
    sizes = cp_mod._cluster_sizes_cached(art)

    ub = qc + radii[None, :]
    order_ub = np.argsort(ub, axis=1, kind="stable")
    csum = np.cumsum(
        np.take_along_axis(np.broadcast_to(sizes, ub.shape), order_ub, axis=1),
        axis=1,
    )
    pos = np.argmax(csum >= k, axis=1)
    ub_sorted = np.take_along_axis(ub, order_ub, axis=1)
    t_prime = ub_sorted[np.arange(len(qids)), pos]
    need1 = (qc - radii[None, :]) <= t_prime[:, None]
    fq, fc = np.nonzero(need1)
    probe_map = {int(c): fq[fc == c] for c in np.unique(fc)}
    print(
        f"admitted (q,cluster) pairs: {len(fq):,} of {need1.size:,} "
        f"({100 * len(fq) / need1.size:.0f}%); admitted rows: "
        f"{float((need1 @ sizes).sum()):,.0f}"
    )

    packed = packed_assignment_cached(art)
    tasks = cp_mod._scan_tasks(len(qids))

    def scan(bounds):
        return cluster_scan_topk(
            packed, qids, qmat, probe_map, "l2", k,
            n_tasks=tasks, qbounds=bounds,
        )

    for name, b in (("noclip", None), ("clip", t_prime)):
        frag = scan(b)
        n_frag = frag.select("qid").count()
        n_cand = (
            frag.selectExpr("sum(size(ids)) as s").collect()[0]["s"]
        )
        print(f"{name}: fragment rows {n_frag:,}, candidate rows {n_cand:,}")

    fast = ClusterPrunedExactSearcher(nprobe=8).attach(art)
    mins = {"scan_only": 9e9, "scan_merge": 9e9, "fast": 9e9}
    # warm
    materialize(scan(t_prime))
    materialize(merge_fragment_topk(scan(t_prime), k, n_queries=len(qids)))
    materialize(fast.search(q, 20, qid_col="qid", vec_col="vec"))
    for rep in range(6):
        t0 = time.time()
        materialize(scan(t_prime))
        mins["scan_only"] = min(mins["scan_only"], time.time() - t0)
        t0 = time.time()
        materialize(
            merge_fragment_topk(scan(t_prime), k, n_queries=len(qids))
            .select("qid", "id")
        )
        mins["scan_merge"] = min(mins["scan_merge"], time.time() - t0)
        t0 = time.time()
        materialize(
            fast.search(q, 20, qid_col="qid", vec_col="vec").select("qid", "id")
        )
        mins["fast"] = min(mins["fast"], time.time() - t0)
        print(f"rep{rep} done", flush=True)
    for n, t in mins.items():
        print(f"{n}: {t:.3f}s  ({2048 / t:,.0f} QPS-equivalent)")


if __name__ == "__main__":
    main()
