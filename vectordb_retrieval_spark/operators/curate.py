"""One-call corpus curation: scrub → quality gate → exact dedup →
split → sequence packing.

The reference engine (Human-Augment-Analytics/vectordb-retrieval)
stops at retrieval; this is the end-to-end training-data path the
round catalogue checks as ``pipeline_curate_corpus``.

Plan shape (the round-9 rework of the r8 composition, which ran the
stages as independent scans glued by two doc_id joins and measured
12.4k docs/s at 1M while its stages ran 96k-335k standalone):

1. **PII scrub + quality rules + token count in ONE projection** over
   the scan — the scrub is regexp column expressions and the quality
   rules all derive from a single shared tokenization of the scrubbed
   text (textops.quality_rules), so the corpus is read and tokenized
   exactly once.
2. **Quality filter BEFORE dedup** — a pure column predicate that
   stays in the scan stage and shrinks the dedup shuffle by the drop
   rate.  (Semantics: the keeper of a duplicate group is the smallest
   id among QUALITY-PASSING copies, so quality-dropping one copy never
   deletes the whole group — the r8 composition computed keepers on
   the full corpus and could.)
3. **Window dedup, not groupBy+join** — keeper = row_number 1 over
   (PARTITION BY canonical text ORDER BY id): one shuffle keyed on the
   canonical text, no join-back of keeper ids against the corpus.
4. **Split is a column expression** (sampling.split_dataset).
5. **Packing carries (split, clean_len) through its shard window**
   (pack_greedy carry_cols) — no final self-join to re-attach them.

Distributed cost: one scan + two shuffles (dedup window, pack window).
The r8 shape was three scans + one aggregate shuffle + three joins +
one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import (
    canonical_text,
    tokens_expr,
)
from vectordb_retrieval_spark.operators.packing import pack_greedy
from vectordb_retrieval_spark.operators.sampling import split_dataset
from vectordb_retrieval_spark.operators.scrub import pii_scrub
from vectordb_retrieval_spark.operators.textops import quality_rules


def curate_corpus(
    df: DataFrame,
    split_weights: dict[str, float] | None = None,
    budget: int = 256,
    n_shards: int = 8,
    seed: int = 21,
    id_col: str = "doc_id",
    text_col: str = "text",
    **quality_kwargs,
) -> DataFrame:
    """Curate ``df`` into packed training rows:
    (doc_id, split, clean_len, shard, seq_id, seq_off, n_tokens) —
    one row per surviving document."""
    split_weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}

    # Evaluate the scrub ONCE and the tokenization ONCE per row.  A
    # plain .select chain collapses into a single Project and Catalyst
    # inlines the aliased expression into every consumer — the 4-regex
    # scrub and the token split would re-evaluate per quality rule
    # (measured 5x slower end to end at 1M docs).  explode(array(x))
    # is a Generate boundary: Projects don't collapse through it, so
    # downstream references are attribute reads, not recomputation.
    scr = pii_scrub(df, id_col, text_col)
    once = lambda c: F.explode(F.array(c))  # noqa: E731
    s1 = scr.select("doc_id", once(F.col("text_clean")).alias("text_clean"))
    s2 = s1.select(
        "doc_id",
        "text_clean",
        once(tokens_expr(F.col("text_clean"))).alias("_toks"),
    )
    rules = quality_rules(F.col("_toks"), **quality_kwargs)
    keep = (
        rules["r_len"] & rules["r_mean"] & rules["r_stop"] & rules["r_rep"]
    )
    q = (
        s2.filter(keep)
        .select(
            "doc_id",
            "text_clean",
            rules["n_tokens"].cast("long").alias("n_tokens"),
        )
    )

    w = Window.partitionBy(canonical_text(F.col("text_clean"))).orderBy(
        "doc_id"
    )
    keepers = (
        q.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    sp = split_dataset(keepers, split_weights, seed).withColumn(
        "clean_len", F.length("text_clean").cast("int")
    )
    packed = pack_greedy(
        sp,
        budget,
        n_shards,
        text_col="text_clean",
        tokens_col="n_tokens",
        carry_cols=("split", "clean_len"),
    )
    return packed.select(
        "doc_id", "split", "clean_len", "shard", "seq_id", "seq_off",
        "n_tokens",
    )


def curate_web(
    df: DataFrame,
    k: int = 6,
    min_count: int = 2,
    min_tokens: int = 1,
    split_weights: dict[str, float] | None = None,
    seed: int = 21,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Web-corpus curation: URL dedup → substring-span cut → length
    gate → split.  The CCNet/RefinedWeb front half, composed from the
    round's url/substring operators so the stage WIRING (not just each
    stage) sits under one hash check.

    Stages and their scale shape:
    1. URL dedup — window keeper (row_number 1 over the normalized URL
       ordered by id): one shuffle, no join-back, exactly the dedup
       shape curate_corpus uses for canonical text.
    2. Substring cut over the URL survivors only (the URL stage is the
       cheap one — run it first so the gram explode pays for fewer
       docs).
    3. Length gate on kept-token count — pure arithmetic on the cut's
       own accounting (n_tokens − n_removed), no re-tokenization.
    4. Hash-range split — pure column expression.

    Returns (doc_id, split, clean_len, text_hash) for every surviving
    document, ordered nowhere (caller sorts).
    """
    from vectordb_retrieval_spark.operators.substring import substring_dedup
    from vectordb_retrieval_spark.operators.urlops import normalize_url

    split_weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    w = Window.partitionBy("_nu").orderBy(id_col)
    survivors = (
        df.withColumn("_nu", normalize_url(F.col(url_col)))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_nu", "_r")
    )
    cut = substring_dedup(
        survivors, k=k, min_count=min_count, id_col=id_col, text_col=text_col
    )
    gated = cut.withColumn(
        "clean_len", (F.col("n_tokens") - F.col("n_removed")).cast("long")
    ).filter(F.col("clean_len") >= min_tokens)
    return split_dataset(gated, split_weights, seed=seed, id_col="doc_id").select(
        "doc_id", "split", "clean_len", "text_hash"
    )
