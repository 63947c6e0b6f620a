"""MS MARCO pre-embedded Parquet loader (the reference's 3-pass scan).

Reference counterpart: dataset.py:1110-1701 —
pass 1: read queries (embedding + relevant doc ids);
pass 2: scan passages retaining the first ``base_limit`` rows PLUS every
        passage some query needs as a positive (even past the limit);
pass 3: align ground truth by joining positives back to retained
        passages.

Spark-first: pass 2's "keep needed rows past the limit" loop becomes
``limit(base_limit) UNION left-semi-join(needed_ids)`` — two scans of
the same Parquet (columnar, pruned) instead of a stateful row loop;
pass 3 is a hash join.  The vector column is found by schema inference
(sources.vector_schema), mirroring the reference's Arrow-type probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from vectordb_retrieval_spark.sources.vector_schema import (
    find_id_column,
    find_vector_column,
)


def _normalize(df: DataFrame, id_out: str) -> DataFrame:
    vec_col, wrapped = find_vector_column(df)
    id_col = find_id_column(df)
    if id_col is None:
        raise ValueError(f"no id column found in {df.columns}")
    vec = F.col(f"{vec_col}.values") if wrapped else F.col(vec_col)
    keep = [
        F.col(id_col).cast("long").alias(id_out),
        F.transform(vec, lambda x: x.cast("float")).alias("vec"),
    ]
    extras = [
        c for c in df.columns if c not in (id_col, vec_col)
    ]
    return df.select(*keep, *extras)


def preembedded_dataset(
    passages: DataFrame,
    queries: DataFrame,
    base_limit: int | None = None,
    query_limit: int | None = None,
    positives_col: str = "relevant_doc_ids",
    gt_k: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, gt) from pre-embedded passage/query tables.

    ``queries`` must carry an array column ``positives_col`` of relevant
    passage ids.  Returns train(id, vec), test(qid, vec),
    gt(qid, id, rank) where gt keeps only positives that survived into
    the retained passage set (reference pass-3 semantics).
    """
    base = _normalize(passages, "id")
    qs = _normalize(queries, "qid")
    if query_limit is not None:
        qs = qs.orderBy("qid").limit(query_limit)

    needed = qs.select(F.explode(F.col(positives_col)).alias("id")).distinct()

    if base_limit is not None:
        head = base.orderBy("id").limit(base_limit)
        # positives outside the prefix are retained anyway
        # (reference: dataset.py:1541-1552)
        extra = base.join(needed, "id", "left_semi").join(
            head.select("id"), "id", "left_anti"
        )
        train = head.unionByName(extra)
    else:
        train = base

    w = Window.partitionBy("qid").orderBy("id")
    gt = (
        qs.select("qid", F.explode(F.col(positives_col)).alias("id"))
        .withColumn("id", F.col("id").cast("long"))
        .join(train.select("id"), "id", "left_semi")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= gt_k)
    )
    test = qs.select("qid", "vec")
    return train.select("id", "vec"), test, gt
