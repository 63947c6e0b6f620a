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
from pyspark.sql import types as T

from vectordb_retrieval_spark.metrics import (
    latency_stats,
    retrieval_metrics,
    retrieval_metrics_multi,
)
from vectordb_retrieval_spark.operators.exact import exact_knn

K = 10
QUERY_FILTER = "vec_id % 10 = 0"


def _round6(df: DataFrame) -> DataFrame:
    """Round every double column to 6 dp (both engines round identically
    on values not adjacent to a rounding boundary)."""
    return df.select(
        *[
            F.round(F.col(f.name), 6).alias(f.name)
            if isinstance(f.dataType, (T.DoubleType, T.FloatType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


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


def _pred_gt(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic (pred, gt) pair for metric queries: gt = exact L2
    top-10 on the full 64-d vectors; pred = exact L2 top-10 on the
    first-8-dims truncation (a deterministic, SQL-reproducible
    "approximate" searcher with non-trivial recall)."""
    base = _emb(spark, sf_dir)
    qs = base.filter(F.expr(QUERY_FILTER))
    trunc = base.withColumn("trunc", F.slice("embedding", 1, 8))
    qtrunc = qs.withColumn("trunc", F.slice("embedding", 1, 8))
    pred = exact_knn(
        trunc, qtrunc, K, "l2", id_col="vec_id", vec_col="trunc", qid_col="vec_id"
    )
    gt = exact_knn(
        base, qs, K, "l2", id_col="vec_id", vec_col="embedding", qid_col="vec_id"
    )
    return pred, gt


def _metrics_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred, gt = _pred_gt(spark, sf_dir)
    return _round6(retrieval_metrics(pred, gt, K))


def _metrics_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred, gt = _pred_gt(spark, sf_dir)
    return _round6(retrieval_metrics_multi(pred, gt, [1, 5, 10]))


def _latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("value").alias("t")
    )
    return _round6(latency_stats(ev, "t"))


# Metric CTE pipeline shared by the metrics oracles.  pred = exact IP
# top-10, gt = exact L2 top-10; binary-relevance metrics per
# vectordb_retrieval_spark/metrics.py definitions.
_METRICS_CTE = """
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 10 = 0
),
dl AS (
  SELECT q.qid, b.vec_id AS id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_distance(q.qv, CAST(b.embedding AS DOUBLE[])), b.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings b
),
gt AS (SELECT qid, id FROM dl WHERE rank <= {k}),
dp AS (
  SELECT q.qid, b.vec_id AS id,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY list_distance(q.qv[1:8], CAST(b.embedding AS DOUBLE[])[1:8]),
                    b.vec_id
         ) AS rank
  FROM q CROSS JOIN embeddings b
),
pred AS (SELECT qid, id, rank FROM dp WHERE rank <= {k}),
sizes AS (SELECT qid, count(*) AS n_gt FROM gt GROUP BY qid),
marked AS (
  SELECT p.qid, p.rank,
         CASE WHEN g.id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM pred p LEFT JOIN gt g ON p.qid = g.qid AND p.id = g.id
),
scored AS (
  SELECT qid, hit, rank,
         sum(hit) OVER (PARTITION BY qid ORDER BY rank) AS cum
  FROM marked
),
perq_raw AS (
  SELECT qid,
         sum(hit) AS n_hit,
         sum(hit * cum * 1.0 / rank) AS ap_sum,
         sum(hit * 1.0 / log2(rank + 1)) AS dcg,
         min(CASE WHEN hit = 1 THEN rank END) AS first_hit
  FROM scored GROUP BY qid
),
perq AS (
  SELECT s.qid,
         coalesce(p.n_hit, 0) * 1.0 / s.n_gt AS recall,
         coalesce(p.n_hit, 0) * 1.0 / {k} AS precision,
         coalesce(p.ap_sum, 0) / s.n_gt AS ap,
         coalesce(p.dcg, 0)
           / list_sum(list_transform(generate_series(1, least(s.n_gt, {k})),
                                     i -> 1.0 / log2(i + 1))) AS ndcg,
         CASE WHEN coalesce(p.n_hit, 0) > 0 THEN 1.0 ELSE 0.0 END AS any_hit,
         coalesce(1.0 / p.first_hit, 0.0) AS rr
  FROM sizes s LEFT JOIN perq_raw p ON s.qid = p.qid
)
SELECT CAST({k} AS BIGINT) AS k,
       count(*) AS n_queries,
       round(avg(recall), 6) AS recall,
       round(avg(precision), 6) AS precision,
       round(avg(ap), 6) AS map,
       round(avg(ndcg), 6) AS ndcg,
       round(avg(any_hit), 6) AS hit_rate,
       round(avg(rr), 6) AS mrr
FROM perq
"""

_LATENCY_ORACLE = """
SELECT count(*) AS n,
       round(avg(value), 6) AS mean,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       round(min(value), 6) AS min,
       round(max(value), 6) AS max
FROM events
"""


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
        "retrieval_metrics_at_10": _metrics_at_10,
        "retrieval_metrics_sweep": _metrics_sweep,
        "latency_stats_events": _latency_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "knn_exact_l2": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["l2"]),
        "knn_exact_cosine": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["cosine"]),
        "knn_exact_ip": _KNN_ORACLE.format(dist_expr=_DIST_EXPRS["ip"]),
        "retrieval_metrics_at_10": _METRICS_CTE.format(k=10),
        "retrieval_metrics_sweep": " UNION ALL ".join(
            f"({_METRICS_CTE.format(k=k)})" for k in (1, 5, 10)
        ),
        "latency_stats_events": _LATENCY_ORACLE,
    }
