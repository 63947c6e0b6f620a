"""Round-9 curation-layer driver queries: exact substring (span-level)
dedup and SemDeDup-style cluster-scoped semantic dedup.

Appended LAST in the catalogue collect order so the driver's fixed
first-50 correctness slots are unchanged; these rows are verified by
the same DuckDB oracle via tools/check_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectordb_retrieval_spark.driver_queries.ann import (
    N_FIXED_CENTROIDS,
    ivf_fixed_centroids,
)
from vectordb_retrieval_spark.driver_queries.common import docs, emb
from vectordb_retrieval_spark.driver_queries.dedupq import _h60, _TOKS
from vectordb_retrieval_spark.operators.dedup import semantic_dedup
from vectordb_retrieval_spark.operators.substring import (
    duplicated_spans,
    substring_dedup,
)

SPAN_K = 6  # 6-token windows: catches every duplicated run of >= 6 tokens
SPAN_MIN_COUNT = 2
SEM_COSINE_T = 0.4  # within-cluster pairs sit >= 1e-4 from this boundary


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicated_spans(docs(spark, sf_dir), SPAN_K, SPAN_MIN_COUNT).orderBy(
        "doc_id", "span_start"
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_dedup(docs(spark, sf_dir), SPAN_K, SPAN_MIN_COUNT).orderBy(
        "doc_id"
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = ivf_fixed_centroids(spark, sf_dir)
    return semantic_dedup(emb(spark, sf_dir), cents, SEM_COSINE_T).orderBy("vec_id")


# -------------------------------------------------------------- oracles

_GRAM_CTES = f"""
toks AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
gpos AS (
  SELECT id, toks, unnest(generate_series(1, len(toks) - {SPAN_K - 1})) AS pos
  FROM toks WHERE len(toks) >= {SPAN_K}
),
g AS (
  SELECT id, pos,
         {_h60(f"array_to_string(toks[pos:pos+{SPAN_K - 1}], ' ')")} AS gh
  FROM gpos
),
d AS (
  SELECT id, pos FROM (
    SELECT id, pos, count(*) OVER (PARTITION BY gh) AS cnt FROM g
  ) WHERE cnt >= {SPAN_MIN_COUNT}
)
"""

_SPANS_ORACLE = f"""
WITH {_GRAM_CTES},
lagd AS (
  SELECT id, pos, lag(pos, 1, pos) OVER (PARTITION BY id ORDER BY pos) AS lp
  FROM d
),
isl AS (
  SELECT id, pos,
         sum(CASE WHEN pos - lp > {SPAN_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY pos) AS island
  FROM lagd
)
SELECT id AS doc_id, min(pos) AS span_start,
       max(pos) + {SPAN_K - 1} AS span_end, count(*) AS n_grams
FROM isl GROUP BY id, island ORDER BY doc_id, span_start
"""

_CUT_ORACLE = f"""
WITH {_GRAM_CTES},
cov AS (
  SELECT DISTINCT id, unnest(generate_series(pos, pos + {SPAN_K - 1})) AS cpos
  FROM d
),
tokp AS (
  SELECT id, toks, unnest(generate_series(1, len(toks))) AS pos
  FROM toks WHERE len(toks) > 0
),
tok AS (SELECT id, pos, toks[pos] AS tok FROM tokp),
kept AS (
  SELECT t.id, t.pos, t.tok
  FROM tok t LEFT JOIN cov c ON c.id = t.id AND c.cpos = t.pos
  WHERE c.id IS NULL
),
reb AS (SELECT id, string_agg(tok, ' ' ORDER BY pos) AS txt FROM kept GROUP BY id),
ncov AS (SELECT id, count(*) AS n_removed FROM cov GROUP BY id)
SELECT t.id AS doc_id, len(t.toks) AS n_tokens,
       coalesce(n.n_removed, 0) AS n_removed,
       md5(coalesce(r.txt, '')) AS text_hash
FROM toks t
LEFT JOIN ncov n ON n.id = t.id
LEFT JOIN reb r ON r.id = t.id
ORDER BY doc_id
"""

_SEMDEDUP_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {N_FIXED_CENTROIDS}
),
assign AS (
  SELECT id, cid AS cluster_id FROM (
    SELECT b.vec_id AS id, c.cid,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_distance(CAST(b.embedding AS DOUBLE[]), c.cv), c.cid
           ) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.id
  FROM assign a
  JOIN assign b ON a.cluster_id = b.cluster_id AND a.id < b.id
  JOIN embeddings ea ON ea.vec_id = a.id
  JOIN embeddings eb ON eb.vec_id = b.id
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                               CAST(eb.embedding AS DOUBLE[])) >= {SEM_COSINE_T}
)
SELECT a.id AS vec_id, CAST(a.cluster_id AS INT) AS cluster_id
FROM assign a LEFT JOIN dropped d ON d.id = a.id
WHERE d.id IS NULL ORDER BY vec_id
"""

QUERIES = {
    "substring_dup_spans": q_substring_spans,
    "substring_dedup_cut": q_substring_dedup,
    "semantic_dedup_fixed": q_semantic_dedup,
}

ORACLES = {
    "substring_dup_spans": _SPANS_ORACLE,
    "substring_dedup_cut": _CUT_ORACLE,
    "semantic_dedup_fixed": _SEMDEDUP_ORACLE,
}
