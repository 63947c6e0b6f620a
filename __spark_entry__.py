"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship exact-kNN query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Convention for oracle-checked outputs: integer columns wherever
possible (qid/id/rank/counts); any float column is rounded to 6
decimals on BOTH sides.  Orderings always tie-break on id so both
engines sort identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.exact import exact_knn

K = 10
QUERY_FILTER = "vec_id % 10 = 0"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _knn(spark: SparkSession, sf_dir: str, metric: str) -> DataFrame:
    base = _emb(spark, sf_dir)
    queries = base.filter(F.expr(QUERY_FILTER))
    res = exact_knn(
        base,
        queries,
        K,
        metric,
        id_col="vec_id",
        vec_col="embedding",
        qid_col="vec_id",
    )
    return res.select("qid", "id", "rank")


_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 10 = 0
),
d AS (
  SELECT q.qid, b.vec_id AS id, {dist_expr} AS dist
  FROM q CROSS JOIN embeddings b
),
r AS (
  SELECT qid, id,
         row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
  FROM d
)
SELECT qid, id, rank FROM r WHERE rank <= 10
"""

_DIST_EXPRS = {
    "l2": "list_distance(q.qv, CAST(b.embedding AS DOUBLE[]))",
    "cosine": "1.0 - list_cosine_similarity(q.qv, CAST(b.embedding AS DOUBLE[]))",
    "ip": "-list_dot_product(q.qv, CAST(b.embedding AS DOUBLE[]))",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact L2 top-10 over sf0.001 embeddings."""
    sf_dir = "/root/testdata/sf0.001"
    base = _emb(spark, sf_dir)
    queries = base.filter(F.expr(QUERY_FILTER))
    return exact_knn(
        base, queries, K, "l2", id_col="vec_id", vec_col="embedding", qid_col="vec_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_exact_l2": lambda spark, sf: _knn(spark, sf, "l2"),
        "knn_exact_cosine": lambda spark, sf: _knn(spark, sf, "cosine"),
        "knn_exact_ip": lambda spark, sf: _knn(spark, sf, "ip"),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_exact_l2": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["l2"]),
        "knn_exact_cosine": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["cosine"]),
        "knn_exact_ip": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["ip"]),
    }
