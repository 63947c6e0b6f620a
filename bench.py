"""Headline benchmark: one representative query per operator family.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed around full materialization (noop sink — executes
the whole plan, no driver collect, no output I/O), after a small warmup
job so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "knn_exact_l2",
    "knn_exact_cosine",
    "lsh_search_cosine",
    "ivf_kmeans_search",
    "pq_adc_search",
    "cluster_pruned_exact_search",
    "retrieval_metrics_sweep",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "text_quality",
    "multimodal_frame_sample",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")

    from vectordb_retrieval_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warmup: JVM, parquet footer reads, codegen
    spark.range(1000).selectExpr("sum(id)").collect()
    materialize(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
