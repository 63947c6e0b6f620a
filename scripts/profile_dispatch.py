"""Measure the Python-worker dispatch floor vs task count, and the full
SQ8 65k search wall vs query-partition count."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher
    from vectordb_retrieval_spark.operators.quant import SQ8Codec
    from vectordb_retrieval_spark.session import get_spark
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    spark = get_spark("profile-dispatch")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    base = random_vectors(spark, 20_000, 64, seed=7).cache()
    base.count()
    art = IVFIndexer(
        nlist=256, seed=7, max_iter=10, init_mode="k-means||", codec=SQ8Codec()
    ).build(base, id_col="id", vec_col="vec")
    materialize(art.tables["assignment"])

    q16 = random_vectors(spark, 16_384, 64, seed=7, stream=5, id_col="qid").cache()
    q16.count()
    big = q16
    for j in range(1, 4):
        big = big.union(q16.select((F.col("qid") + 1_000_000 * j).alias("qid"), "vec"))

    for nparts in (32, 24, 16, 12, 8):
        bigp = big.repartition(nparts).cache()
        bigp.count()
        # identity mapInArrow floor
        ident = bigp.mapInArrow(lambda it: it, schema="qid long, vec array<float>")
        materialize(ident)
        ts = []
        for _ in range(4):
            t0 = time.time()
            materialize(
                bigp.mapInArrow(lambda it: it, schema="qid long, vec array<float>")
            )
            ts.append(time.time() - t0)
        t_floor = min(ts)

        searcher = IVFSearcher(nprobe=24).attach(art)
        materialize(searcher.search(bigp, 20, qid_col="qid", vec_col="vec"))
        ts = []
        for _ in range(4):
            t0 = time.time()
            materialize(
                searcher.search(bigp, 20, qid_col="qid", vec_col="vec").select(
                    "qid", "id"
                )
            )
            ts.append(time.time() - t0)
        t_search = min(ts)
        print(
            f"parts={nparts:3d}: identity floor {t_floor:.3f}s | "
            f"search {t_search:.3f}s -> QPS {65_536/t_search:.0f}"
        )
        bigp.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
