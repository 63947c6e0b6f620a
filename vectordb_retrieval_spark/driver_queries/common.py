"""Shared helpers for the driver query catalogue."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

K = 10
QUERY_FILTER = "vec_id % 10 = 0"


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a scan UP to the session's parallelism when the file
    layout gives fewer partitions than cores (a small local file is one
    row-group → one task, serializing every downstream expression and
    Arrow kernel).  At cluster scale the scan already has ≥ cores
    partitions and this is a no-op — never a down-shuffle of a big scan."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
# schema inference rejects (PARQUET_TYPE_ILLEGAL) unless the session set
# spark.sql.legacy.parquet.nanosAsLong — which the driver's session may
# not have.  An explicit schema skips footer inference entirely and reads
# the physical INT64 as epoch-nanos, working under ANY session config.
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.schema(EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")


def round6(df: DataFrame) -> DataFrame:
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


def sql_float_list(vals) -> str:
    """A DuckDB DOUBLE[] literal that parses to the exact float64s."""
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"
