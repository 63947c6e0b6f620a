"""Measure the streaming graph ingestion rate in isolation (the bench's
sing_graph row), with a per-batch wall breakdown to localize any
regression: routing, affected-shard discovery, rebuild, refresh.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_retrieval_spark.session import get_spark
from vectordb_retrieval_spark.sources.random_gen import clustered_vectors
from vectordb_retrieval_spark.operators.graph_ann import (
    GraphANNIndexer,
    graph_append,
)
from vectordb_retrieval_spark.streaming.serving import await_or_raise
from vectordb_retrieval_spark.driver_queries.streamq import _state_partitions


def main() -> None:
    spark = get_spark("ab-graph-ingest")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_g = 40_000
    gvecs = clustered_vectors(
        spark, n_g, 64, n_clusters=50, spread=0.35, seed=19,
        stream=12, num_partitions=cpus,
    ).cache()
    gvecs.count()
    t0 = time.time()
    g_holder = [
        GraphANNIndexer(m=8, ef_construction=32, num_partitions=8).build(
            gvecs.filter(F.col("id") % 4 == 0)
        )
    ]
    print(f"build: {time.time() - t0:.2f}s")

    batch_walls = []

    def g_sink(df, epoch_id):
        t = time.time()
        g_holder[0] = graph_append(g_holder[0], df)
        batch_walls.append(time.time() - t)

    workdir = tempfile.mkdtemp(prefix="abgraph-")
    try:
        ddir = os.path.join(workdir, "graph")
        streamed = gvecs.select("id", "vec").filter(F.col("id") % 4 != 0)
        n_rows = streamed.count()
        (
            streamed.withColumn(
                "batch",
                F.pmod(F.xxhash64(F.col("id")), F.lit(3)).cast("int"),
            )
            .repartition(3, "batch")
            .write.partitionBy("batch")
            .parquet(ddir)
        )
        stream = (
            spark.readStream.schema("id long, vec array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(ddir, "batch=*"))
        )
        t0 = time.time()
        with _state_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(g_sink)
                .option("checkpointLocation", os.path.join(ddir, "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            await_or_raise(q, 600)
        wall = time.time() - t0
        print(
            f"rows={n_rows} wall={wall:.2f}s rate={n_rows / wall:,.0f} rows/s"
        )
        print("batch walls:", [round(w, 2) for w in batch_walls])
        print(f"scheduling overhead: {wall - sum(batch_walls):.2f}s")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
