"""Decompose the 65k-query IVF-SQ8 serving wall into kernel vs fixed
cost.

Reproduces bench.py's random-20k×64-d workload (nlist=256, SQ8,
nprobe=24, k=20), then:
1. times search_batch (the whole per-task body) driver-side on a
   2048-query block — the pure-NumPy kernel cost per task;
2. cProfiles one such call;
3. times the full Spark job at 16k/65k/262k queries.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.operators.serving import (
        pack_clusters,
        search_batch,
    )
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    spark = get_spark("profile-sq8")
    base = random_vectors(spark, 20_000, 64, seed=7).cache()
    base.count()
    art = IVFIndexer(
        nlist=256, seed=7, max_iter=10, init_mode="k-means||", codec=SQ8Codec()
    ).build(base, id_col="id", vec_col="vec")
    art.tables["assignment"].write.format("noop").mode("overwrite").save()

    idx = pack_clusters(
        art.tables["assignment"],
        "codes",
        art.params["centroids"],
        art.params["codec"],
    )
    rng = np.random.RandomState(3)
    qmat = rng.randn(2048, 64).astype(np.float32)
    qids = np.arange(2048, dtype=np.int64)

    # warm (decode caches, BLAS)
    search_batch(idx, qids, qmat, 24, 20, "l2")
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        search_batch(idx, qids, qmat, 24, 20, "l2")
    t_task = (time.time() - t0) / reps
    print(f"kernel per 2048q task: {t_task*1000:.1f} ms "
          f"-> single-thread QPS {2048/t_task:.0f}")

    pr = cProfile.Profile()
    pr.enable()
    search_batch(idx, qids, qmat, 24, 20, "l2")
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())

    # full Spark path
    searcher = IVFSearcher(nprobe=24).attach(art)
    q16 = random_vectors(spark, 16_384, 64, seed=7, stream=5, id_col="qid").cache()
    q16.count()
    big = q16
    for j in range(1, 4):
        big = big.union(q16.select((F.col("qid") + 1_000_000 * j).alias("qid"), "vec"))
    big = big.repartition(32).cache()
    big.count()

    def run(qdf):
        searcher.search(qdf, 20, qid_col="qid", vec_col="vec").write.format(
            "noop"
        ).mode("overwrite").save()

    for label, qdf, n in (("16k", q16, 16_384), ("65k", big, 65_536)):
        run(qdf)  # warm
        ts = []
        for _ in range(4):
            t0 = time.time()
            run(qdf)
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"{label}: wall {t:.3f} s -> QPS {n/t:.0f}   (all reps: "
              + ", ".join(f"{x:.3f}" for x in ts) + ")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
