"""Scalar/array function layer: distance kernels, hashing, text utilities."""

from vectordb_retrieval_spark.functions.distance import (  # noqa: F401
    METRICS,
    distance_col,
    pairwise_distances,
    normalize_rows,
)
