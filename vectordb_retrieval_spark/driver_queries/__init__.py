"""Driver-facing query catalogue.

Each submodule contributes a pair of dicts:
- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame
- ``ORACLES``: name → DuckDB SQL string (omitted ⇒ rows-only check)

``__spark_entry__`` aggregates these.  Conventions (driver hash-matches
values exactly): prefer integer output columns; round any float to 6
decimals on both sides; always tie-break orderings on an id column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_catalogue() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    from vectordb_retrieval_spark.driver_queries import (
        ann,
        curationq,
        dedupq,
        filesq,
        knn,
        metricsq,
        pipelineq,
        retrievalq,
        sourcesq,
        streamq,
        temporalq,
        textq,
    )

    # Order = priority if the driver ever truncates the catalogue:
    # reference-parity first (knn/metrics/ann), then the pipeline
    # extensions, then streaming (sole driver evidence for §2.9),
    # then the source/persistence round-trips (which also carry
    # pytest coverage of their own).
    queries: dict = {}
    oracles: dict = {}
    for mod in (
        knn, metricsq, ann, dedupq, textq, streamq, temporalq,
        retrievalq, sourcesq, filesq, pipelineq, curationq,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
