"""Text-analysis + multimodal driver queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import docs, round6
from vectordb_retrieval_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    fake_decode,
    frame_sample,
    media_features,
    resize_media,
)
from vectordb_retrieval_spark.operators.textops import (
    STOPWORDS,
    corpus_stats,
    decontam_overlap,
    doc_fingerprint,
    lang_id,
    quality_filter,
    repetition_signals,
    text_quality,
    token_counts,
)

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_CANON = r"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"
FRAME_STRIDE = 32


def _sql_str_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(docs(spark, sf_dir))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(docs(spark, sf_dir))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = attach_binary_payload(docs(spark, sf_dir))
    return round6(decode_media(payloads, decode_fn=fake_decode))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = attach_binary_payload(docs(spark, sf_dir))
    return frame_sample(payloads, FRAME_STRIDE)


def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = attach_binary_payload(docs(spark, sf_dir))
    return resize_media(payloads, 8, 8)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = attach_binary_payload(docs(spark, sf_dir))
    return media_features(payloads, 16)


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(docs(spark, sf_dir))


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_filter(docs(spark, sf_dir))


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontam_overlap(docs(spark, sf_dir))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats(docs(spark, sf_dir))


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end cleaning pipeline in one call: exact-dedup keepers
    ∧ quality-rule keeps → corpus stats of the surviving docs.  Pure
    composition of the tested operators (dedup.exact_dedup,
    quality_filter, corpus_stats)."""
    from vectordb_retrieval_spark.operators.dedup import exact_dedup

    d = docs(spark, sf_dir)
    keepers = exact_dedup(d).select(F.col("keeper_id").alias("doc_id"))
    kept = (
        quality_filter(d)
        .where(F.col("keep") == 1)
        .select(F.col("id").alias("doc_id"))
    )
    return corpus_stats(d.join(keepers, "doc_id").join(kept, "doc_id"))


_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id AS id,
       len(toks) AS n_tokens,
       length(text) AS n_chars,
       round(list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks), 6)
         AS mean_token_len,
       round(len(list_filter(toks, x -> list_contains({_sql_str_list(STOPWORDS['en'])}, x)))
             * 1.0 / len(toks), 6) AS stopword_ratio,
       len(string_split_regex(text, '[.,;:!?]')) AS n_punct_splits
FROM t
"""


def _lang_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT id, '{lang}' AS lang, "
        f"len(list_filter(toks, x -> list_contains({_sql_str_list(STOPWORDS[lang])}, x))) AS n "
        "FROM t"
        for lang in sorted(STOPWORDS)
    )
    return f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
scores AS ({selects}),
ranked AS (
  SELECT id, lang, n,
         row_number() OVER (PARTITION BY id ORDER BY n DESC, lang ASC) AS rn
  FROM scores
)
SELECT id, CASE WHEN n > 0 THEN lang ELSE 'und' END AS pred_lang
FROM ranked WHERE rn = 1
"""


_TOKEN_COUNT_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id AS id,
       len(toks) AS n_tokens_ws,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens_re
FROM t
"""

_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, text,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [] END AS sh
  FROM t
)
SELECT doc_id AS id,
       md5({_CANON}) AS fingerprint,
       list_min(list_transform(sh,
         x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS winnow60
FROM s
"""

_REPETITION_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS g2
  FROM t
)
SELECT doc_id AS id,
       round(list_max(list_transform(list_distinct(toks),
               w -> len(list_filter(toks, x -> x = w)))) * 1.0 / len(toks), 6)
         AS top_word_frac,
       CASE WHEN len(g2) > 0 THEN
         round(list_max(list_transform(list_distinct(g2),
                 w -> len(list_filter(g2, x -> x = w)))) * 1.0 / len(g2), 6)
       END AS top_2gram_frac,
       round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_ratio
FROM g
"""

_QUALITY_FILTER_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id, len(toks) AS n,
         list_sum(list_transform(toks, x -> length(x))) AS chars,
         len(list_filter(toks,
             x -> list_contains({_sql_str_list(STOPWORDS['en'])}, x))) AS n_stop,
         list_max(list_transform(list_distinct(toks),
             w -> len(list_filter(toks, x -> x = w)))) AS top
  FROM t
)
SELECT doc_id AS id,
       CAST(n >= 20 AND n <= 400 AS INT) AS r_len,
       CAST(chars >= 2 * n AND chars <= 12 * n AS INT) AS r_mean_len,
       CAST(n_stop > 0 AS INT) AS r_stopword,
       CAST(top * 5 <= n AS INT) AS r_repetition,
       CAST(n >= 20 AND n <= 400 AND chars >= 2 * n AND chars <= 12 * n
            AND n_stop > 0 AND top * 5 <= n AS INT) AS keep
FROM f
"""

_DECONTAM_ORACLE = f"""
WITH t AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [] END AS sh
  FROM t
),
e AS (SELECT id, unnest(sh) AS g FROM s)
SELECT tr.id AS train_id, be.id AS bench_id, count(*) AS n_shared
FROM e tr JOIN e be ON tr.g = be.g
WHERE tr.id % 50 <> 0 AND be.id % 50 = 0
GROUP BY tr.id, be.id
HAVING count(*) >= 2
ORDER BY train_id, bench_id
"""

_CORPUS_STATS_ORACLE = f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents)
SELECT count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       min(len(toks)) AS min_tokens,
       max(len(toks)) AS max_tokens,
       round(avg(len(toks)), 6) AS mean_tokens,
       (SELECT count(DISTINCT tok)
        FROM (SELECT unnest(toks) AS tok FROM t)) AS vocab_size
FROM t
"""

_CLEAN_CORPUS_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY {_CANON}),
f AS (
  SELECT doc_id, len(toks) AS n,
         list_sum(list_transform(toks, x -> length(x))) AS chars,
         len(list_filter(toks,
             x -> list_contains({_sql_str_list(STOPWORDS['en'])}, x))) AS n_stop,
         list_max(list_transform(list_distinct(toks),
             w -> len(list_filter(toks, x -> x = w)))) AS top
  FROM t
),
surv AS (
  SELECT t.toks FROM t
  JOIN keepers USING (doc_id)
  JOIN f ON f.doc_id = t.doc_id
  WHERE f.n >= 20 AND f.n <= 400 AND f.chars >= 2 * f.n AND f.chars <= 12 * f.n
    AND f.n_stop > 0 AND f.top * 5 <= f.n
)
SELECT count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       min(len(toks)) AS min_tokens,
       max(len(toks)) AS max_tokens,
       round(avg(len(toks)), 6) AS mean_tokens,
       (SELECT count(DISTINCT tok)
        FROM (SELECT unnest(toks) AS tok FROM surv)) AS vocab_size
FROM surv
"""

_MULTIMODAL_ORACLE = """
SELECT doc_id AS id,
       16 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 AS width,
       16 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 AS height,
       round(list_sum(list_transform(generate_series(1, length(text)),
                                     i -> ascii(substr(text, i, 1))))
             * 1.0 / length(text) / 255.0, 6) AS mean_intensity
FROM documents
"""

_FRAME_ORACLE = f"""
SELECT doc_id AS id,
       CAST(off AS INT) AS frame_offset,
       CAST('0x' || substr(md5(substr(text, CAST(off AS INT) + 1, {FRAME_STRIDE})), 1, 14)
            AS BIGINT) AS frame_fp
FROM documents, unnest(generate_series(0, length(text) - 1, {FRAME_STRIDE})) t(off)
"""

# 8×8 NN-resize of the byte-grid image; dims derive from md5 exactly as
# the stub decoder's, pixel (r,c) = byte[(r*w + c) mod n] read as the
# ASCII code of the text character (payload == utf-8 of ASCII text)
_RESIZE_ORACLE = """
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         16 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 AS w,
         16 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 AS h
  FROM documents
)
SELECT doc_id AS id, 8 AS out_w, 8 AS out_h,
       CAST(sum(ord(substr(text, ((r * h // 8) * w + (c * w // 8)) % n + 1, 1)))
            AS BIGINT) AS checksum
FROM p, generate_series(0, 7) t1(r), generate_series(0, 7) t2(c)
GROUP BY doc_id
"""

# 16-bin byte histogram (bin = byte // 16) over the ASCII payload, all
# bins present with zero counts
_FEATURES_ORACLE = """
WITH cnt AS (
  SELECT doc_id, ord(substr(text, i, 1)) // 16 AS bin, count(*) AS n
  FROM documents, unnest(generate_series(1, length(text))) t(i)
  GROUP BY doc_id, ord(substr(text, i, 1)) // 16
)
SELECT d.doc_id AS id, b.bin, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM documents d
CROSS JOIN generate_series(0, 15) b(bin)
LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.bin = b.bin
"""

QUERIES = {
    "text_quality": q_text_quality,
    "text_lang_id": q_lang_id,
    "text_token_counts": q_token_counts,
    "text_doc_fingerprint": q_doc_fingerprint,
    "text_repetition": q_repetition,
    "text_quality_filter": q_quality_filter,
    "text_decontam_overlap": q_decontam,
    "text_corpus_stats": q_corpus_stats,
    "pipeline_clean_corpus": q_clean_corpus,
    "multimodal_decode_meta": q_multimodal_meta,
    "multimodal_frame_sample": q_frame_sample,
    "multimodal_resize": q_resize,
    "multimodal_features": q_media_features,
}

ORACLES = {
    "text_quality": _QUALITY_ORACLE,
    "text_lang_id": _lang_oracle(),
    "text_token_counts": _TOKEN_COUNT_ORACLE,
    "text_doc_fingerprint": _FINGERPRINT_ORACLE,
    "text_repetition": _REPETITION_ORACLE,
    "text_quality_filter": _QUALITY_FILTER_ORACLE,
    "text_decontam_overlap": _DECONTAM_ORACLE,
    "text_corpus_stats": _CORPUS_STATS_ORACLE,
    "pipeline_clean_corpus": _CLEAN_CORPUS_ORACLE,
    "multimodal_decode_meta": _MULTIMODAL_ORACLE,
    "multimodal_frame_sample": _FRAME_ORACLE,
    "multimodal_resize": _RESIZE_ORACLE,
    "multimodal_features": _FEATURES_ORACLE,
}
