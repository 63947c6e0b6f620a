"""Streaming query serving: continuous top-k search over a query stream.

The reference has no streaming surface (SURVEY.md §2.9) — its batch
loop over query chunks (experiment_runner.py:420-446) is the closest
analogue.  This module layers the engine's batch searchers onto
Structured Streaming:

- ``serve_knn_stream``: readStream of query batches → ``foreachBatch``
  running any attached searcher (exact or ANN) against the (static)
  index → sink.  Each micro-batch is a plain DataFrame, so the entire
  batch operator library applies unchanged; the index artifact stays
  resident across batches.
- ``streaming_running_topk``: a custom **stateful** operator via
  ``applyInPandasWithState`` — per query key, the best-k neighbors seen
  across all micro-batches so far (the streaming refinement shape:
  results improve as more index shards are scanned/arrive).
- ``windowed_query_stats``: watermarked sliding-window throughput/
  latency aggregation over a query-event stream — the late-data-safe
  monitoring pipe.

Scale: ``foreachBatch`` inherits every batch-path property (broadcast
queries, partition-pruned probes); state in the running-topk operator
is bounded at k rows per key; the stats window uses watermark eviction,
so state never grows unboundedly.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def await_or_raise(query, timeout_s: float) -> None:
    """``query.awaitTermination(timeout_s)`` that FAILS LOUDLY on
    timeout: stops the query and raises instead of letting the caller
    proceed against a half-ingested index while ``foreachBatch`` may
    still be mutating shared state (a silent wrong-result mode).  Use
    this for every bounded (``availableNow``) stream wait."""
    if not query.awaitTermination(timeout_s):
        try:
            query.stop()
        except Exception:
            pass  # stop() racing a concurrent failure must not mask the timeout
        raise TimeoutError(
            f"streaming query {query.id} did not finish within "
            f"{timeout_s}s; stopped to avoid serving a partially "
            "ingested result"
        )


def serve_knn_stream(
    query_stream: DataFrame,
    search_fn: Callable[[DataFrame, int], DataFrame],
    k: int,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Wire a streaming query DataFrame through a batch search function.

    ``search_fn(batch_df, k) -> DataFrame(qid, id, dist, rank)`` is any
    engine searcher closure (exact_knn, attached IVF/LSH searcher...);
    ``sink_fn(result_df, epoch_id)`` lands results (write, enqueue...).
    Returns the started StreamingQuery.
    """

    def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink_fn(search_fn(batch_df, k), epoch_id)

    writer = query_stream.writeStream.foreachBatch(run_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# state: parallel arrays of the current best-k (id, dist)
_TOPK_STATE_SCHEMA = "ids array<long>, dists array<double>"
_TOPK_OUT_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("id", LongType()),
        StructField("dist", DoubleType()),
        StructField("rank", LongType()),
    ]
)


def streaming_running_topk(candidates_stream: DataFrame, k: int) -> DataFrame:
    """Stateful streaming top-k per query: input stream of scored
    candidates (qid, id, dist); output, per micro-batch, the refined
    best-k for every qid that received new candidates.

    State is bounded: exactly ≤k (id, dist) pairs per active qid."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (qid,) = key
        if state.exists:
            ids, dists = state.get
            cur = pd.DataFrame({"id": list(ids), "dist": list(dists)})
        else:
            cur = pd.DataFrame({"id": [], "dist": []})
        for pdf in batches:
            cur = pd.concat([cur, pdf[["id", "dist"]]], ignore_index=True)
        cur = (
            cur.sort_values(["dist", "id"])
            .drop_duplicates("id")
            .head(k)
            .reset_index(drop=True)
        )
        state.update((cur["id"].astype("int64").tolist(),
                      cur["dist"].astype("float64").tolist()))
        out = cur.copy()
        out.insert(0, "qid", int(qid))
        out["rank"] = range(1, len(out) + 1)
        yield out

    return candidates_stream.groupBy("qid").applyInPandasWithState(
        update,
        outputStructType=_TOPK_OUT_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    docs_stream: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Continuous exact dedup over a document stream: key = md5 of the
    canonical text, first occurrence wins, duplicates dropped across
    micro-batches via ``dropDuplicatesWithinWatermark``.

    The watermark bounds state: a key is only held until the event-time
    watermark passes its first sighting + horizon, so state size tracks
    the dedup horizon, not the stream's history — the property that
    makes continuous ingestion dedup viable at 100 TB/day.  (Batch
    counterpart: operators.dedup.exact_dedup.)"""
    from vectordb_retrieval_spark.operators.dedup import canonical_text

    keyed = docs_stream.withColumn(
        "fingerprint", F.md5(canonical_text(F.col(text_col)))
    )
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def windowed_query_stats(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """Watermarked windowed monitoring aggregation over query events:
    per window, query count + mean/max latency.  Works identically on a
    static DataFrame (tests) and a stream (production)."""
    win = F.window(F.col(ts_col), window, slide or window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("n_queries"),
            F.avg(latency_col).alias("mean_latency_ms"),
            F.max(latency_col).alias("max_latency_ms"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_queries",
            F.round("mean_latency_ms", 6).alias("mean_latency_ms"),
            "max_latency_ms",
        )
    )
