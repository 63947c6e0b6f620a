"""Sequence packing for LLM pretraining shards.

The reference engine (Human-Augment-Analytics/vectordb-retrieval) stops
at retrieval; a training-data pipeline additionally has to turn a
cleaned corpus into fixed-token-budget training sequences.  Two packing
disciplines, both pure DataFrame compositions (no UDFs):

- ``pack_greedy``: whole-document packing — each doc lands in the
  sequence where its token stream STARTS (sequences overflow by at most
  one document's tokens; no doc is split).  This is first-fit on a
  deterministic document order.
- ``pack_spans``: concat-and-chunk packing — the per-shard token
  streams are concatenated and cut at exact ``budget`` boundaries, so a
  document may straddle sequences; the output is one row per
  (doc, sequence) span with in-doc token offsets.  This is the
  standard GPT-style pretraining layout.

Scale shape: documents are salted into ``n_shards`` independent shards
(shard = doc_id mod n_shards), and every window below is PARTITIONED BY
shard — cumulative sums never serialize onto one task.  At 100 TB you
raise ``n_shards`` to O(corpus/executor-memory) and each shard's
packing is an in-partition running sum.  The doc-order inside a shard
is deterministic (doc_id), so packing is reproducible run-to-run —
a hard requirement for resumable training jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import tokens_expr


def _with_shard_offsets(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    text_col: str,
    tokens_col: str | None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_off, *carry_cols): exclusive
    running token sum within the doc's shard, ordered by doc_id.
    ``carry_cols`` ride through the window so callers composing packing
    with upstream stages (split labels, lengths) don't need a
    join-back against the packed output."""
    n_tok = (
        F.col(tokens_col)
        if tokens_col
        else F.size(tokens_expr(F.col(text_col)))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
        *[F.col(c) for c in carry_cols],
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.withColumn(
        "start_off", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Whole-document packing: (doc_id, shard, seq_id, seq_off,
    n_tokens, *carry_cols).

    ``seq_id`` = the sequence whose window contains the doc's START
    offset; ``seq_off`` = the doc's position inside that sequence's
    token stream.  Sequences may overflow ``budget`` by < one doc (the
    overflow-tolerant variant used when documents must stay whole)."""
    offs = _with_shard_offsets(
        df, n_shards, id_col, text_col, tokens_col, carry_cols
    )
    return offs.select(
        "doc_id",
        "shard",
        F.floor(F.col("start_off") / budget).cast("int").alias("seq_id"),
        (F.col("start_off") % budget).cast("int").alias("seq_off"),
        "n_tokens",
        *carry_cols,
    )


def pack_spans(
    df: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: one row per (doc, sequence) span —
    (doc_id, shard, seq_id, tok_start, tok_end) with [tok_start, tok_end)
    in-document token offsets; a doc spanning k sequences emits k rows.

    The explode is ``sequence(first_seq, last_seq)`` per doc — bounded
    by ceil(n_tokens/budget)+1 rows per doc, never corpus-quadratic."""
    offs = _with_shard_offsets(df, n_shards, id_col, text_col, tokens_col)
    first_seq = F.floor(F.col("start_off") / budget)
    last_seq = F.floor((F.col("start_off") + F.col("n_tokens") - 1) / budget)
    spans = offs.withColumn(
        "_seq", F.explode(F.sequence(first_seq, last_seq))
    ).withColumn("seq_id", F.col("_seq").cast("int"))
    seq_start = F.col("seq_id").cast("long") * budget
    return spans.select(
        "doc_id",
        "shard",
        "seq_id",
        F.greatest(seq_start - F.col("start_off"), F.lit(0))
        .cast("int")
        .alias("tok_start"),
        F.least(
            seq_start + budget - F.col("start_off"), F.col("n_tokens")
        )
        .cast("int")
        .alias("tok_end"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split", "shard"),
) -> None:
    """Land a curated/packed corpus as the training-ready layout:
    Parquet partitioned by (split, shard) — a trainer reads exactly its
    split's directories and streams shard files in order, and a split
    filter prunes partitions at the scan (no data read for the other
    splits).  One write job; partition count = |splits| × n_shards."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into export shards: every row gets a
    pseudo-random (but seed-reproducible) shard and a dense position
    within it — the write layout for shuffled training-data shards.

    shard/position derive from sampling.sample_hash — an affine hash
    mod 2^31−1 over the id's low AND high bits, so arithmetic id
    progressions disperse and 64-bit ids never share a residue-class
    coin; the position window is PARTITIONED BY shard, so the sort is
    n_shards independent in-partition sorts, not a global one."""
    from vectordb_retrieval_spark.operators.sampling import sample_hash

    h = sample_hash(F.col(id_col), seed)
    shuf = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return shuf.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("int")
    ).drop("_h")
