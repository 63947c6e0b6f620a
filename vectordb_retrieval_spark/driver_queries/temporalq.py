"""Temporal-join driver queries over the events table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import (
    read_parquet_cached_schema,
)
from vectordb_retrieval_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts arrives TIMESTAMP_NTZ; cast for unix_micros (session TZ is
    # pinned UTC, so the cast is value-preserving)
    return read_parquet_cached_schema(spark, f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(clicks, views, right_payload=("event_id", "ts"))
    return joined.select(
        F.col("event_id").alias("id"),
        "user_id",
        F.col("asof_event_id").alias("asof_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("lag_us"),
    )


def q_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error")
    clicks = ev.where(F.col("event_type") == "click")
    return range_join(errors, clicks, window_s=60)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return sessionize(ev, gap_s=1800).select(
        F.col("event_id").alias("id"), "user_id", "session_idx"
    )


_ASOF_ORACLE = """
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
m AS (
  SELECT c.event_id AS id, c.user_id AS user_id, v.event_id AS asof_id,
         date_diff('microsecond', v.ts, c.ts) AS lag_us,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
  FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
)
SELECT id, user_id, asof_id, lag_us FROM m WHERE rn = 1
"""

_RANGE_ORACLE = """
SELECT e.event_id AS a, c.event_id AS b,
       date_diff('microsecond', e.ts, c.ts) AS dt_us
FROM events e JOIN events c
  ON e.event_type = 'error' AND c.event_type = 'click'
 AND abs(date_diff('microsecond', e.ts, c.ts)) <= 60 * 1000000
"""

_SESSION_ORACLE = """
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('microsecond', lag(ts) OVER w, ts)
                  > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT event_id AS id, user_id,
       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
FROM g
"""

QUERIES = {
    "events_asof_join": q_asof,
    "events_range_join": q_range,
    "events_sessionize": q_sessionize,
}

ORACLES = {
    "events_asof_join": _ASOF_ORACLE,
    "events_range_join": _RANGE_ORACLE,
    "events_sessionize": _SESSION_ORACLE,
}
