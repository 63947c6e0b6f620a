"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship exact-kNN query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2),
aggregated from ``vectordb_retrieval_spark.driver_queries``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key (queries
without an oracle get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries import collect_catalogue
from vectordb_retrieval_spark.driver_queries.common import K, QUERY_FILTER
from vectordb_retrieval_spark.operators.exact import exact_knn

_QUERIES, _ORACLES = collect_catalogue()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact L2 top-10 over sf0.001 embeddings."""
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = base.filter(F.expr(QUERY_FILTER))
    return exact_knn(
        base, queries, K, "l2", id_col="vec_id", vec_col="embedding", qid_col="vec_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
