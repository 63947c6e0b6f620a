"""Driver queries for the dataset-source / dataprep operators.

``dataprep_embed_stub`` is fully oracle-checked: the hash-stub encoder's
sign-sums are recomputed in SQL from md5 of each token (exact integers,
no float drift).  The generator/TF-IDF/subsample paths use engine
internals an external SQL engine cannot reproduce (Philox streams,
MLlib vocabulary fit, xxhash64 ordering), so they register rows-only;
their semantics are pinned by tests/test_sources.py instead.
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


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF embed the documents table in-engine; emit per-doc
    non-zero counts + round6 vector norm (deterministic, rows-only)."""
    d = docs(spark, sf_dir)
    vec = TfidfVectorizer(max_features=64).fit(d)
    out = vec.transform(d, id_col="doc_id")
    nz = F.size(F.filter("vec", lambda x: x != 0))
    norm = F.sqrt(F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x))
    return out.select("id", nz.alias("n_nonzero"), F.round(norm, 6).alias("norm"))


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

QUERIES = {
    "dataprep_embed_stub": q_embed_stub,
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
    "dataprep_subsample": _SUBSAMPLE_ORACLE,
    "source_random_dataset_gt": _RAND_GT_ORACLE,
}
