"""Bucketed-table sink: shuffle-free co-located joins at cluster scale.

The reference never re-joins its artifacts (each algorithm run is a
single pass), but a 100 TB deployment of this engine constantly joins
big tables on the same key — assignment tables to vector tables, GT to
results, dedup pairs to corpora.  Hash-bucketing both sides on the join
key at WRITE time makes every later equi-join shuffle-free: Spark reads
matching buckets pairwise, so the join is a per-bucket sort-merge with
NO Exchange on either side — the single biggest recurring cost at scale
amortized into one write.

Spark-native parquet bucketing (``bucketBy().sortBy().saveAsTable``) —
no Hive needed; bucket metadata lives in the session catalog and the
files self-describe via the bucket id in file names.

Contract: both join sides need the SAME bucket count and key; the
optimizer then elides both Exchanges (and with ``sortBy`` both Sorts).
``assert_no_shuffle_join`` verifies that property from the physical
plan — the check tests run on every build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and optionally
    sorted) on ``bucket_cols`` — the write-side half of a shuffle-free
    join.  Bucket count is a layout decision: pick it once per subject
    area so co-joined tables agree (32 here mirrors the test cluster's
    parallelism; at 100 TB pick ~2× total cores).  ``path`` makes it an
    external table at that location (the warehouse dir is a static
    conf, so explicit locations are how tests and multi-tenant
    deployments steer the files)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def assert_no_shuffle_join(joined: DataFrame) -> str:
    """Return the physical plan of ``joined`` after asserting it contains
    a join but NO shuffle exchange — the signature of a co-located
    bucket join.  Raises AssertionError with the plan text otherwise."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Join" not in plan:
        raise AssertionError(f"no join in plan:\n{plan}")
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(f"bucket join still shuffles:\n{plan}")
    return plan
