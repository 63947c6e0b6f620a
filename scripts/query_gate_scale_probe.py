"""Past-gate serving probe: run exact_knn and IVF-SQ8 serving with a
query frame ABOVE the broadcast gate, so the salted qid-hash chunked
path executes for real at scale (r11; the pinned tests exercise it at
toy thresholds).

Usage:  python scripts/query_gate_scale_probe.py [n_queries]

Builds a 20k x 64d random base, replicates the 2048-query batch up to
``n_queries`` (default 786 432 = 3 x the 262 144-row gate), and prints
one JSON line with wall times, per-path row counts, and the number of
chunks the gate produced.  Run it alone for clean timings.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 786_432
    from vectordb_retrieval_spark.functions import kernels as K
    from vectordb_retrieval_spark.operators.exact import exact_knn
    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    spark = get_spark("gate-scale-probe")
    base = random_vectors(spark, 20_000, 64, seed=7).cache()
    base.count()
    q = random_vectors(spark, 2048, 64, seed=7, stream=2, id_col="qid")
    reps = -(-n_target // 2048)
    big = q
    for j in range(1, reps):
        big = big.union(q.select((F.col("qid") + 10_000_000 * j).alias("qid"), "vec"))
    big = big.repartition(64).cache()
    n = big.count()
    gated = K.query_broadcast_cached(big, "qid", "vec") is None
    out = {"n_queries": n, "past_gate": bool(gated)}

    t0 = time.time()
    res = exact_knn(base, big, 10)
    out["exact_rows"] = res.count()
    out["exact_knn_s"] = round(time.time() - t0, 1)
    out["exact_qps"] = round(n / out["exact_knn_s"], 1)

    art = IVFIndexer(
        nlist=256, seed=7, max_iter=10, init_mode="k-means||", codec=SQ8Codec()
    ).build(base, id_col="id", vec_col="vec")
    s = IVFSearcher(nprobe=24).attach(art)
    s.search(q.limit(256), 10).count()  # warm the serving broadcast
    t0 = time.time()
    out["sq8_rows"] = s.search(big, 10).select("qid", "id").count()
    out["sq8_s"] = round(time.time() - t0, 1)
    out["sq8_qps"] = round(n / out["sq8_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
