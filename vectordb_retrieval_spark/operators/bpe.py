"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

Classic byte-pair-encoding merges are learned from the WORD FREQUENCY
table, not the raw corpus — so the expensive distributed work is one
corpus tokenization + one groupBy(word) count, and the merge loop runs
over the (cached, much smaller) distinct-word table:

  per merge step:
    1. explode each word's current symbol sequence into adjacent
       symbol pairs weighted by the word's corpus count — a projection;
    2. one map-side-combined groupBy(pair) + max to pick the winner
       (ties broken lexicographically so the result is deterministic
       and engine-independent);
    3. apply the merge to every word's symbol sequence (an Arrow
       mapInPandas kernel — the sequences are tiny; the table is the
       distinct vocabulary, not the corpus).

This is an inherently iterative algorithm (each merge depends on the
previous), so it carries a pytest pin against a pure-python reference
implementation instead of a SQL oracle (the driver records its
catalogue entry as a rows-only check).

Scale notes: the distinct-word table at web scale is ~1e8 rows — the
merge loop's per-step cost is bounded by it, not the corpus; the
symbol-pair aggregate is map-side combined; `n_merges` Spark jobs of
that size are the honest cost of exact BPE (the reference engine has
no tokenizer training at all).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import tokens_expr

_EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count): the corpus word-frequency table BPE trains on."""
    return (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(syms array<string>, count): each word split into characters with
    the end-of-word marker appended (the classic BPE alphabet)."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("syms"),
        "count",
    )


def _apply_merge_kernel(a: str, b: str):
    merged = a + b

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out_syms.append(res)
            yield pd.DataFrame({"syms": out_syms, "count": pdf["count"]})

    return kernel


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in order.  Stops early when no adjacent pair occurs twice."""
    syms = _initial_symbols(word_counts(df, text_col)).cache()
    syms.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = syms.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
                "count",
            ).groupBy("p.a", "p.b").agg(F.sum("count").alias("n"))
            best = pairs.orderBy(
                F.col("n").desc(), F.col("a"), F.col("b")
            ).limit(1).collect()
            if not best or best[0]["n"] < 2:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            new_syms = syms.mapInPandas(
                _apply_merge_kernel(a, b),
                schema="syms array<string>, count long",
            ).cache()
            new_syms.count()
            syms.unpersist()
            syms = new_syms
    finally:
        syms.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): token accounting of the corpus under
    a learned merge list — the quantity a token-budgeted pipeline
    (packing, mixture planning) consumes.  One Arrow pass; each word is
    segmented by applying the merges in order (reference BPE
    semantics)."""
    merge_list = list(merges)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            got = cache.get(word)
            if got is not None:
                return got
            syms = list(word) + [_EOW]
            for a, b in merge_list:
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
                if len(syms) == 1:
                    break
            cache[word] = len(syms)
            return len(syms)

        for pdf in batches:
            words = [str(t).split() for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_words": [len(ws) for ws in words],
                    "n_bpe_tokens": [
                        sum(n_tokens(w) for w in ws) for ws in words
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="id long, n_words long, n_bpe_tokens long"
    )
