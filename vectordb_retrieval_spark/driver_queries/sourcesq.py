"""Driver queries for the dataset-source / dataprep operators.

``dataprep_embed_stub`` is fully oracle-checked: the hash-stub encoder's
sign-sums are recomputed in SQL from md5 of each token (exact integers,
no float drift).  ``dataprep_tfidf`` pins its vocabulary to a total
order (df DESC, term ASC) so the whole TF-IDF space reproduces in
DuckDB count/log arithmetic.  The random-generator path uses Philox
streams no SQL engine reproduces, so its oracle checks the
self-consistency invariant (generated GT == exact kNN) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import docs
from vectordb_retrieval_spark.operators.exact import exact_knn
from vectordb_retrieval_spark.sources.embedder import embed_text, subsample
from vectordb_retrieval_spark.sources.random_gen import random_dataset
from vectordb_retrieval_spark.sources.tfidf import TfidfVectorizer

EMBED_DIM = 32
SUBSAMPLE_N = 100
RAND_N, RAND_Q, RAND_D, RAND_K = 500, 8, 16, 5


def q_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded non-zero components of the un-normalized hash-stub
    embedding — exact integers, hash-matchable."""
    dense = embed_text(docs(spark, sf_dir), dim=EMBED_DIM, normalize=False)
    return (
        dense.select("id", F.posexplode("embedding").alias("dim", "v"))
        .filter(F.col("v") != 0)
        .select("id", "dim", F.col("v").cast("int").alias("signed_count"))
    )


def q_pipeline_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BASELINE north star end-to-end: batch-embed the documents
    table with the (SQL-reproducible, integer-valued) hash-stub encoder,
    then exact kNN of the query docs against the corpus in embedding
    space.  Distances are integer quadratic forms, so the whole
    embed→search pipeline hash-matches the oracle exactly."""
    dense = embed_text(docs(spark, sf_dir), dim=EMBED_DIM, normalize=False)
    qdf = dense.filter(F.col("id") % 10 == 0)
    res = exact_knn(
        dense, qdf, 10, "l2", id_col="id", vec_col="embedding", qid_col="id"
    )
    return res.select("qid", "id", "rank")


TFIDF_FEATURES = 64


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF embed the documents table in a deterministically pinned
    vocabulary (top-64 terms by document frequency DESC, term ASC) and
    emit the exploded non-zero components.  Every weight is
    tf · ln((m+1)/(df+1)) — pure count/log arithmetic a SQL engine
    reproduces exactly, so the query hash-matches its oracle.  No
    float summation anywhere: each emitted value depends only on its
    own (tf, df) pair, never on aggregation order."""
    d = docs(spark, sf_dir)
    vec = TfidfVectorizer(max_features=TFIDF_FEATURES).fit(d, deterministic=True)
    out = vec.transform(d, id_col="doc_id", vec_dtype="float64")
    return (
        out.select("id", F.posexplode("vec").alias("dim", "w"))
        .filter(F.col("w") != 0)
        .select("id", "dim", F.round("w", 6).alias("w"))
    )


def q_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic subsample of the documents table."""
    return subsample(docs(spark, sf_dir), SUBSAMPLE_N, seed=7).select("doc_id")


def q_random_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate a random dataset on-cluster and verify its ground truth
    reproduces through the exact-kNN operator: emits per-query match
    counts (must equal RAND_K for every query)."""
    train, test, gt = random_dataset(
        spark, RAND_N, RAND_Q, RAND_D, ground_truth_k=RAND_K, seed=13
    )
    knn = exact_knn(train, test, RAND_K, "l2", qid_col="qid", qvec_col="vec")
    gx = gt.select("qid", F.explode("gt").alias("id"))
    matches = knn.join(gx, ["qid", "id"]).groupBy("qid").agg(
        F.count("*").alias("n_match")
    )
    return matches.select("qid", "n_match")


_EMBED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS tok
  FROM documents
),
h AS (
  SELECT id,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {EMBED_DIM} AS INT)
           AS dim,
         CASE WHEN CAST('0x' || substr(md5(tok), 9, 2) AS INT) & 1 = 1
              THEN 1 ELSE -1 END AS sign
  FROM toks
),
sums AS (SELECT id, dim, CAST(sum(sign) AS INT) AS signed_count FROM h GROUP BY id, dim)
SELECT id, dim, signed_count FROM sums WHERE signed_count <> 0
"""

# sparse form of the embed→kNN pipeline: dist²(a,b) = ‖a‖² + ‖b‖² −
# 2·a·b over the integer sign-sum embeddings — every term an exact
# integer, dot products via a dim-equi-join of the sparse components
_PIPELINE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS tok
  FROM documents
),
h AS (
  SELECT id,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {EMBED_DIM} AS INT)
           AS dim,
         CASE WHEN CAST('0x' || substr(md5(tok), 9, 2) AS INT) & 1 = 1
              THEN 1 ELSE -1 END AS sign
  FROM toks
),
sums AS (SELECT id, dim, CAST(sum(sign) AS BIGINT) AS c FROM h GROUP BY id, dim),
ids AS (SELECT doc_id AS id FROM documents),
norms AS (
  SELECT ids.id, COALESCE(s.n2, 0) AS n2
  FROM ids LEFT JOIN (SELECT id, sum(c * c) AS n2 FROM sums GROUP BY id) s
    ON s.id = ids.id
),
dots AS (
  SELECT a.id AS qid, b.id AS id, sum(a.c * b.c) AS dp
  FROM sums a JOIN sums b ON a.dim = b.dim
  WHERE a.id % 10 = 0
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT q.id AS qid, b.id AS id,
         nq.n2 + nb.n2 - 2 * COALESCE(d.dp, 0) AS d2
  FROM ids q
  CROSS JOIN ids b
  JOIN norms nq ON nq.id = q.id
  JOIN norms nb ON nb.id = b.id
  LEFT JOIN dots d ON d.qid = q.id AND d.id = b.id
  WHERE q.id % 10 = 0
),
r AS (
  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank
  FROM pairs
)
SELECT qid, id, rank FROM r WHERE rank <= 10
"""

QUERIES = {
    "dataprep_embed_stub": q_embed_stub,
    "pipeline_embed_knn": q_pipeline_embed_knn,
    "dataprep_tfidf": q_tfidf,
    "dataprep_subsample": q_subsample,
    "source_random_dataset_gt": q_random_dataset,
}

# the generator's GT must agree with exact kNN on every query — the
# expected output is the constant invariant n_match == RAND_K, which
# makes the self-check hash-matchable even though Philox streams are
# not SQL-expressible
_RAND_GT_ORACLE = f"""
SELECT CAST(range AS BIGINT) AS qid, CAST({RAND_K} AS BIGINT) AS n_match
FROM range(0, {RAND_Q})
"""

# TF-IDF with a pinned vocabulary: tokenization = lowercase split on
# \W+ (RegexTokenizer parity), terms = unigrams + space-joined bigrams
# (NGram parity), vocab = top-N by (df DESC, term ASC), weight =
# tf * ln((m+1)/(df+1)) (MLlib IDF formula), dim = vocab position
_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS t
  FROM documents
),
uni AS (SELECT id, unnest(t) AS term FROM toks),
bi AS (
  SELECT id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS term
  FROM toks
),
terms AS (SELECT id, term FROM uni UNION ALL SELECT id, term FROM bi),
dfreq AS (SELECT term, count(DISTINCT id) AS df FROM terms GROUP BY term),
vocab AS (
  SELECT term, df,
         CAST(row_number() OVER (ORDER BY df DESC, term) - 1 AS INT) AS dim
  FROM dfreq ORDER BY df DESC, term LIMIT {TFIDF_FEATURES}
),
m AS (SELECT count(*) AS n FROM documents),
tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY id, term)
SELECT tf.id, v.dim,
       round(tf.tf * ln((m.n + 1.0) / (v.df + 1.0)), 6) AS w
FROM tf JOIN vocab v USING (term) CROSS JOIN m
WHERE tf.tf * ln((m.n + 1.0) / (v.df + 1.0)) <> 0
"""

# md5-ordered subsample: the seeded hash ordering is engine-agnostic, so
# DuckDB reproduces exactly the same n rows
_SUBSAMPLE_ORACLE = f"""
SELECT doc_id
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
LIMIT {SUBSAMPLE_N}
"""

ORACLES = {
    "dataprep_embed_stub": _EMBED_ORACLE,
    "pipeline_embed_knn": _PIPELINE_ORACLE,
    "dataprep_tfidf": _TFIDF_ORACLE,
    "dataprep_subsample": _SUBSAMPLE_ORACLE,
    "source_random_dataset_gt": _RAND_GT_ORACLE,
}
