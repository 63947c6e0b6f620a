"""Temporal join operators over event streams: as-of join and
bounded-interval range join.

Spark has no native ASOF JOIN (DuckDB/kdb/pandas `merge_asof` do); the
classic distributed reformulation used here avoids a join node
entirely: union both sides, one window per key ordered by time, and
`last(..., ignorenulls)` carries the most recent right-side row forward
onto each left row.  One shuffle on the key, no per-row Python.  The
range join buckets time by the window width so each pair is discovered
by one equi-join probe of three buckets — fan-out is bounded by event
density × window, never n².

These extend the engine beyond the reference (which has no event-time
operators; the events table ships with the test data for the
latency/streaming surface, runner.py:129 analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_payload: tuple[str, ...] = ("event_id",),
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's, within the same ``key_col``
    (backward as-of; forward is this with sides swapped and a
    descending window).  Left rows with no preceding right row keep
    null payload columns.

    The right payload travels as ONE struct so all attached columns
    come from the same matched row.  Equal-timestamp rows on opposite
    sides count as "at or before" (right sorts first at ties).  Among
    right rows tied on (key, ts) the MAX payload struct wins — a
    deterministic tiebreak (field-wise struct comparison, so put a
    unique id first in ``right_payload``); mirror it in any oracle.
    """
    rp = F.struct(*[F.col(c) for c in right_payload])
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__rp", F.lit(None).cast(right.select(rp.alias("s")).schema["s"].dataType)
    )
    r_tagged = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        rp.alias("__rp"),
    )
    # align columns: right side carries nulls for the left payload
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(l_tagged.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "__side", F.col("__rp").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1)
    for c in right_payload:
        out = out.withColumn(prefix + c, F.col("__m")[c])
    return out.drop("__side", "__rp", "__m")


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts
    when the gap to the previous event exceeds ``gap_s`` (strict >).
    Adds ``session_idx`` (0-based per key, in time order) — two window
    passes over one shuffle on the key, no UDFs.  This is the batch
    analogue of Structured Streaming's session window; at 100 TB it is
    one hash shuffle of (key, ts, id), nothing else.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev > gap_s * 1_000_000)
    ).cast("long")
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    window_s: int = 60,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """All (left, right) pairs with |ts_left − ts_right| <= window_s
    (inclusive), discovered sub-quadratically: left buckets by
    floor(epoch / window), right explodes to its bucket ±1, pairs meet
    on bucket equality (each pair in exactly one bucket — the left
    bucket is unique) and the exact microsecond filter runs on the
    candidates.  Join fan-out is density × window per row, never n²;
    a hot interval is a hot bucket, handled by AQE skew-join.

    Returns (a, b, dt_us) with dt_us = right − left in microseconds —
    integer-exact output for oracle comparison.
    """
    bucket = lambda c: F.floor(F.unix_seconds(c) / window_s)  # noqa: E731
    l = left.select(
        F.col(left_id).alias("a"),
        F.unix_micros(F.col(ts_col)).alias("a_us"),
        bucket(F.col(ts_col)).alias("__b"),
    )
    r = right.select(
        F.col(right_id).alias("b"),
        F.unix_micros(F.col(ts_col)).alias("b_us"),
        F.explode(
            F.array(
                bucket(F.col(ts_col)) - 1,
                bucket(F.col(ts_col)),
                bucket(F.col(ts_col)) + 1,
            )
        ).alias("__b"),
    )
    return (
        l.join(r, "__b")
        .where(F.abs(F.col("b_us") - F.col("a_us")) <= window_s * 1_000_000)
        .select("a", "b", (F.col("b_us") - F.col("a_us")).alias("dt_us"))
    )


def resample(
    df: DataFrame,
    interval_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    fill: str = "ffill",
) -> DataFrame:
    """Per-key fixed-interval downsampling with gap fill — the
    time-series resample every metrics/feature pipeline runs before
    modeling (pandas ``resample``/``asfreq`` semantics, distributed).

    Returns one row per (key, bucket) over each key's FULL bucket range
    [min, max] — empty buckets materialize with ``n_events = 0`` — with
    ``sum_cents`` (the bucket's value sum in integer cents: exact,
    order-independent, reproducible by any SQL engine — float sums are
    not) and ``fill_cents``:

    - ``fill="ffill"``: last non-empty bucket's sum carried forward;
    - ``fill="zero"``: empty buckets read 0;
    - ``fill="none"``: empty buckets stay null.

    Scale shape: one groupBy (key, bucket) with map-side combine, a
    per-key span aggregate, a bounded ``sequence`` explode (span /
    interval rows per key), and one per-key window for the fill —
    never a global window, never per-row Python.
    """
    if fill not in ("ffill", "zero", "none"):
        raise ValueError(f"fill must be ffill|zero|none, got {fill!r}")
    ivl_us = int(interval_s) * 1_000_000
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros({ts_col}) div {ivl_us}").alias("bucket"),
        cents.alias("cents"),
    )
    agg = base.groupBy("key", "bucket").agg(
        F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents")
    )
    spans = agg.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    joined = grid.join(agg, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    )
    if fill == "ffill":
        w = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("sum_cents", ignorenulls=True).over(w)
    elif fill == "zero":
        filled = F.coalesce(F.col("sum_cents"), F.lit(0))
    else:
        filled = F.col("sum_cents")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        "n_events",
        "sum_cents",
        filled.cast("long").alias("fill_cents"),
    )
