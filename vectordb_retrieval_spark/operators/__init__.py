"""Operator layer: kNN search, index build/search pairs, dedup, text ops."""

from vectordb_retrieval_spark.operators.exact import exact_knn  # noqa: F401
from vectordb_retrieval_spark.operators.topk import topk_per_query, pad_topk  # noqa: F401
