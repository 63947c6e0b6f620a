"""A/B: cluster-pruned broadcast serving QPS vs rows_per_task floor.

Replicates the bench's cp_2k config (20k x 64-d base, nlist=64,
nprobe=8, 2048 queries, k=20) and times the broadcast serving plan at
several rows_per_task floors.  Run alone (timing contends with
concurrent Spark sessions).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_retrieval_spark.session import get_spark
from vectordb_retrieval_spark.sources.random_gen import random_vectors
from vectordb_retrieval_spark.operators.cluster_pruned import (
    ClusterPrunedExactIndexer,
    ClusterPrunedExactSearcher,
)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("ab-cp-tasks")
    base = random_vectors(spark, 20_000, 64, seed=7, stream=1).cache()
    base.count()
    q = random_vectors(spark, 2048, 64, seed=7, stream=3, id_col="qid").cache()
    q.count()
    art = ClusterPrunedExactIndexer(
        nlist=64, seed=7, max_iter=10, init_mode="k-means||"
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    from vectordb_retrieval_spark.operators import serving

    orig = serving.query_driven_job
    for floor in (512, 128, 64, 32):
        def patched(qdf, qc, vc, fn, rows_per_task=512, _f=floor):
            return orig(qdf, qc, vc, fn, rows_per_task=_f)

        serving.query_driven_job = patched
        s = ClusterPrunedExactSearcher(nprobe=8).attach(art)
        # fresh searcher per floor -> fresh plan memo
        materialize(s.search(q, 20, qid_col="qid", vec_col="vec"))  # warm
        ts = []
        for _ in range(4):
            t0 = time.time()
            materialize(s.search(q, 20, qid_col="qid", vec_col="vec"))
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"rows_per_task={floor}: {t:.3f}s  {2048 / t:,.0f} QPS")
    serving.query_driven_job = orig


if __name__ == "__main__":
    main()
