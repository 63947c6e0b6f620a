"""Per-query top-k selection and padding — the engine's core "query operator".

Reference semantics being reproduced (Spark-first, not ported):
- partial top-k selection ordered ascending by distance
  (reference: modular.py:347-360) → ``Window.partitionBy(qid).orderBy``
  + ``row_number() <= k``.  Ties break by id so results are
  deterministic across engines and runs.
- ``(inf, -1)`` padding when a query has fewer than k hits
  (reference: lsh.py:279-283, modular.py:357-360) → ``pad_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_query(
    scored: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
    dist_col: str = "dist",
) -> DataFrame:
    """Keep the k nearest rows per query, ranked 1..k ascending by
    (distance, id).  Output columns: qid, id, dist, rank."""
    w = Window.partitionBy(qid_col).orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, dist_col, "rank")
    )


def pad_topk(
    topk: DataFrame,
    queries: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "id",
    dist_col: str = "dist",
) -> DataFrame:
    """Pad every query out to exactly k rows with (id=-1, dist=inf),
    preserving the reference's fixed-shape result contract."""
    frame = queries.select(qid_col).distinct().select(
        qid_col, F.explode(F.sequence(F.lit(1), F.lit(k))).alias("rank")
    )
    return (
        frame.join(topk, [qid_col, "rank"], "left")
        .select(
            qid_col,
            F.coalesce(F.col(id_col), F.lit(-1)).alias(id_col),
            F.coalesce(F.col(dist_col), F.lit(float("inf"))).alias(dist_col),
            "rank",
        )
    )
