"""A/B the duplicated-gram-position plan in operators/substring.py.

Three candidates over the same synthetic corpus (scripts/
substring_scale_probe.synth_docs):

  window   count(*) OVER (PARTITION BY gh)      — 1 gram pass, 1 wide
           shuffle, full sort inside WindowExec
  join     groupBy(gh).count >= 2, join back    — 2 gram passes (md5 is
           recomputed), narrow agg shuffle, AQE picks broadcast when
           the dup set is small
  grouped  groupBy(gh).collect_list((id,pos))   — 1 gram pass, 1 wide
           shuffle, hash aggregate instead of sort, slice-explode
           (minhash_lsh_pairs convention)

    python scripts/ab_dup_positions.py [n_docs] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.substring_scale_probe import synth_docs  # noqa: E402
from vectordb_retrieval_spark.operators.substring import gram_positions  # noqa: E402
from vectordb_retrieval_spark.session import get_spark  # noqa: E402


def dup_window(docs, k):
    g = gram_positions(docs, k)
    cnt = F.count("*").over(Window.partitionBy("gh"))
    return g.withColumn("cnt", cnt).filter(F.col("cnt") >= 2).select("id", "pos")


def dup_join(docs, k):
    g = gram_positions(docs, k)
    dup = g.groupBy("gh").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") >= 2
    ).select("gh")
    return g.join(dup, "gh").select("id", "pos")


def dup_grouped(docs, k):
    g = gram_positions(docs, k)
    grouped = (
        g.groupBy("gh")
        .agg(F.collect_list(F.struct("id", "pos")).alias("occ"))
        .filter(F.size("occ") >= 2)
    )
    return grouped.select(F.explode("occ").alias("o")).select(
        F.col("o.id").alias("id"), F.col("o.pos").alias("pos")
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_dup_positions", master="local[32]")
    docs = synth_docs(spark, n_docs).repartition(32).cache()
    docs.count()
    expected = None
    for name, fn in (("window", dup_window), ("join", dup_join), ("grouped", dup_grouped)):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            n = fn(docs, 6).count()
            walls.append(time.time() - t0)
        if expected is None:
            expected = n
        assert n == expected, (name, n, expected)
        print(f"AB {name}: rows={n} min={min(walls):.2f}s walls={[round(w,2) for w in walls]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
