"""Text-analysis operators for training-data pipelines: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure built-in column expressions (JVM/codegen, no UDFs) — each maps
1:1 to an oracle SQL in driver_queries.textq.  Scale: embarrassingly
parallel per-row transforms; the only shuffle is an optional final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import (
    canonical_text,
    tokens_expr,
)

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "en", "pour", "que"],
}


def text_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features: token count, char count, mean token
    length, stopword ratio (en list), punctuation count."""
    toks = tokens_expr(F.col(text_col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(tok_chars / F.size(toks), 6).alias("mean_token_len"),
        F.round(n_stop / F.size(toks), 6).alias("stopword_ratio"),
        F.size(F.split(F.col(text_col), r"[.,;:!?]")).alias("n_punct_splits"),
    )


def lang_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-vote language heuristic: the language whose stopword list
    matches the most token occurrences wins; ties break alphabetically;
    zero matches → 'und' (undetermined)."""
    toks = tokens_expr(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        lw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(lw, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    # max over (n, reversed-lang) implements: highest n, ties → lowest lang
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["n"].alias("n"),
                    # invert lang ordering so array_max prefers the
                    # alphabetically-smallest language on score ties
                    F.lit(len(scores) - i).alias("inv"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (word / number / single-punctuation pieces)."""
    toks = tokens_expr(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens_ws"),
        F.regexp_count(F.col(text_col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).alias(
            "n_tokens_re"
        ),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content-addressable fingerprint: md5 of canonicalized text, plus
    a 60-bit rolling-window winnow (min shingle hash) for near-dup keys."""
    from vectordb_retrieval_spark.operators.dedup import hash60, word_shingles

    sh = word_shingles(F.col(text_col), 3)
    winnow = F.array_min(F.transform(sh, lambda s: hash60(s)))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(canonical_text(F.col(text_col))).alias("fingerprint"),
        winnow.alias("winnow60"),
    )
