"""Lexical / hybrid / filtered retrieval driver queries.

Four capabilities a production vector store serves beyond plain ANN,
each hash-checked against a DuckDB oracle:

- ``bm25_topk``          — Lucene-BM25 keyword ranking over documents
- ``hybrid_rrf``         — reciprocal-rank fusion of the BM25 ranking
                           with a dense exact-kNN ranking
- ``filtered_knn_exact`` — metadata-predicate + exact kNN (the filter
                           is a plain pushed-down scan predicate)
- ``filtered_ivf_search``— metadata-predicate + PRUNED IVF search: the
                           allowed-id mask applies inside the probed
                           clusters BEFORE top-k selection
                           (pre-filtering), reproduced exactly in SQL

Reference: Human-Augment-Analytics/vectordb-retrieval retrieves dense
top-k only (src/algorithms/*); lexical scoring appears only as a
dataprep embedding stage (src/dataprep).  These queries are engine
extensions in the spirit of its retrieval metrics (recall parity needs
a GT join, fusion needs rank-aligned inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import (
    K,
    QUERY_FILTER,
    emb,
    emb_queries,
    read_parquet_cached_schema,
)
from vectordb_retrieval_spark.operators.exact import exact_knn
from vectordb_retrieval_spark.operators.ivf import FixedCentroidIVFIndexer, IVFSearcher
from vectordb_retrieval_spark.operators.text_retrieval import (
    BM25Indexer,
    BM25Searcher,
    bm25_rank,
    bm25_search,
    hybrid_search,
    rrf_fuse,
)

# fixed keyword query over the synthetic corpus vocabulary
TERMS = ["spark", "join", "window", "hash", "shuffle"]
BM25_TOP = 50
FUSE_CAND = 100
FUSE_TOP = 20
HYBRID_QID = 0  # the dense query vector: embeddings.vec_id = 0
ALLOWED_LABELS = (0, 1)
# reuse the ivf_fixed_search configuration (ann.py) so the filtered
# variant exercises the SAME pruned probe, plus the pre-filter mask
N_FIXED_CENTROIDS = 8
NPROBE_FIXED = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached_schema(spark, f"{sf_dir}/documents.parquet")


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = bm25_rank(_docs(spark, sf_dir), TERMS, top_n=BM25_TOP)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF-fuse the BM25 top-100 with the dense exact top-100 for one
    query embedding (vec_id 0); doc_id and vec_id share a key space in
    the synthetic corpus."""
    docs = _docs(spark, sf_dir)
    base = emb(spark, sf_dir)
    lex = bm25_rank(docs, TERMS, top_n=FUSE_CAND)
    qv = base.filter(F.col("vec_id") == HYBRID_QID)
    dense = exact_knn(
        base, qv, FUSE_CAND, "cosine",
        id_col="vec_id", vec_col="embedding", qid_col="vec_id",
    ).select(F.col("id").alias("doc_id"), "rank")
    fused = rrf_fuse([lex, dense], top_n=FUSE_TOP)
    return fused.select(
        "doc_id", F.round("rrf_score", 6).alias("rrf_score"), "rank"
    )


# three fixed keyword queries for the batched search
MULTI_QUERIES = [
    (0, ["spark", "join"]),
    (1, ["window", "hash", "shuffle"]),
    (2, ["agg", "scan"]),
]
MULTI_K = 15


def bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    qdf = spark.createDataFrame(
        MULTI_QUERIES, schema="qid long, terms array<string>"
    )
    res = bm25_search(_docs(spark, sf_dir), qdf, k=MULTI_K)
    return res.select(
        "qid", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


HYBRID_CAND = 50


def bm25_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched search served from a BUILT lexical index artifact
    (postings/doclens/termstats tables) — identical results to the
    ad-hoc pipeline, so it shares bm25_multiquery's oracle; the index
    pre-pays tokenization + aggregation once per corpus."""
    art = BM25Indexer().build(_docs(spark, sf_dir))
    qdf = spark.createDataFrame(
        MULTI_QUERIES, schema="qid long, terms array<string>"
    )
    res = BM25Searcher().attach(art).search(qdf, k=MULTI_K)
    return res.select(
        "qid", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def hybrid_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched hybrid retrieval: the three MULTI_QUERIES term bags
    paired with the embeddings of vec_id 0/1/2 as dense queries,
    BM25⊕cosine fused per query by RRF."""
    docs = _docs(spark, sf_dir)
    base = emb(spark, sf_dir)
    qdf = spark.createDataFrame(
        MULTI_QUERIES, schema="qid long, terms array<string>"
    ).join(
        base.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        ),
        "qid",
    )
    res = hybrid_search(
        docs, base, qdf, k=MULTI_K, cand=HYBRID_CAND
    )
    return res.select(
        "qid", "doc_id", F.round("rrf_score", 6).alias("rrf_score"), "rank"
    )


def filtered_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN over the label-filtered base: the predicate is a plain
    DataFrame filter, so Catalyst pushes it into the parquet scan —
    the candidate matrix never holds a disallowed row."""
    base = emb(spark, sf_dir)
    allowed = base.filter(F.col("label").isin(*ALLOWED_LABELS))
    qs = emb_queries(spark, sf_dir)
    res = exact_knn(
        allowed, qs, K, "l2",
        id_col="vec_id", vec_col="embedding", qid_col="vec_id",
    )
    return res.select("qid", "id", "rank")


POSTFILTER_OVERSAMPLE = 4


def filtered_graph_postfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-filter adapter over the exhaustive (provably exact) graph
    searcher: search K×oversample unfiltered, keep allowed labels,
    re-rank — the filtered-search recipe for index families whose
    structure can't be masked in-flight (operators/filtered.py).  With
    the exhaustive searcher the whole pipeline is SQL-reproducible."""
    from vectordb_retrieval_spark.operators.filtered import post_filtered_search
    from vectordb_retrieval_spark.operators.graph_ann import (
        GraphANNIndexer,
        GraphANNSearcher,
    )

    base = emb(spark, sf_dir)
    art = GraphANNIndexer(m=8, ef_construction=32, num_partitions=4).build(
        base, id_col="vec_id", vec_col="embedding"
    )
    qs = emb_queries(spark, sf_dir)
    searcher = GraphANNSearcher(ef_search=100_000, force_beam=True).attach(art)
    allowed = base.filter(F.col("label").isin(*ALLOWED_LABELS)).select(
        F.col("vec_id").alias("id")
    )
    res = post_filtered_search(
        searcher, qs, K, allowed,
        oversample=POSTFILTER_OVERSAMPLE,
        qid_col="vec_id", vec_col="embedding",
    )
    return res.select("qid", "id", "rank")


def filtered_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRUNED + pre-filtered IVF: fixed centroids, nprobe=3, and an
    allowed-id mask applied inside the probed clusters before top-k —
    the DuckDB oracle reproduces probing AND the mask exactly."""
    base = emb(spark, sf_dir)
    cdf = read_parquet_cached_schema(spark, f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < N_FIXED_CENTROIDS)  # collect-only: raw scan, see emb_queries
    from vectordb_retrieval_spark.functions.kernels import collect_vectors

    _, cents = collect_vectors(cdf, "vec_id", "embedding", sort_ids=True)
    art = FixedCentroidIVFIndexer(cents, metric="l2").build(
        base, id_col="vec_id", vec_col="embedding"
    )
    qs = emb_queries(spark, sf_dir)
    allowed = base.filter(F.col("label").isin(*ALLOWED_LABELS)).select(
        F.col("vec_id").alias("id")
    )
    res = (
        IVFSearcher(nprobe=NPROBE_FIXED)
        .attach(art)
        .search(
            qs, K, qid_col="vec_id", vec_col="embedding",
            allowed_df=allowed,
        )
    )
    return res.select("qid", "id", "rank")


_TERMS_SQL = ", ".join(f"'{t}'" for t in TERMS)

# mirror of operators/text_retrieval.bm25_rank: whitespace tokens,
# Lucene idf, k1=1.2 b=0.75, (score desc, doc_id) ranking
_BM25_COMMON = f"""
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
bm25 AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
"""

_BM25_ORACLE = f"""
WITH {_BM25_COMMON},
r AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm25
)
SELECT doc_id, round(score, 6) AS score, rank
FROM r WHERE rank <= {BM25_TOP}
"""

_HYBRID_ORACLE = f"""
WITH {_BM25_COMMON},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm25 QUALIFY rank <= {FUSE_CAND}
),
qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id = {HYBRID_QID}
),
dense AS (
  SELECT b.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY 1.0 - list_cosine_similarity(qv.v, CAST(b.embedding AS DOUBLE[])),
                    b.vec_id
         ) AS rank
  FROM embeddings b CROSS JOIN qv
  QUALIFY rank <= {FUSE_CAND}
),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lex
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM dense
),
fused AS (
  SELECT doc_id, sum(c) AS rrf_score FROM contrib GROUP BY doc_id
),
r AS (
  SELECT doc_id, rrf_score,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
)
SELECT doc_id, round(rrf_score, 6) AS rrf_score, rank
FROM r WHERE rank <= {FUSE_TOP}
"""

_MQ_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in MULTI_QUERIES for t in terms
)

# batched BM25: same corpus statistics as _BM25_COMMON, but tf/df over
# the union of all query term bags and a per-(qid, term) join — mirrors
# operators/text_retrieval.bm25_search
_BM25_MULTI_ORACLE = f"""
WITH qterms(qid, term) AS (VALUES {_MQ_VALUES}),
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
r AS (
  SELECT qid, doc_id, score,
         row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id
         ) AS rank
  FROM scored
)
SELECT qid, doc_id, round(score, 6) AS score, rank
FROM r WHERE rank <= {MULTI_K}
"""

# batched hybrid: BM25 scored CTE + per-query dense cosine ranking,
# fused with 1/(60+rank), per-qid re-rank — mirrors hybrid_search
_HYBRID_MULTI_ORACLE = f"""
WITH qterms(qid, term) AS (VALUES {_MQ_VALUES}),
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * 2.2)
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
lex AS (
  SELECT qid, doc_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id
         ) AS rank
  FROM scored QUALIFY rank <= {HYBRID_CAND}
),
qv AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
dense AS (
  SELECT qv.qid, b.vec_id AS doc_id,
         row_number() OVER (
           PARTITION BY qv.qid
           ORDER BY 1.0 - list_cosine_similarity(qv.v, CAST(b.embedding AS DOUBLE[])),
                    b.vec_id
         ) AS rank
  FROM qv CROSS JOIN embeddings b
  QUALIFY rank <= {HYBRID_CAND}
),
contrib AS (
  SELECT qid, doc_id, 1.0 / (60.0 + rank) AS c FROM lex
  UNION ALL
  SELECT qid, doc_id, 1.0 / (60.0 + rank) AS c FROM dense
),
fused AS (
  SELECT qid, doc_id, sum(c) AS rrf_score FROM contrib GROUP BY qid, doc_id
),
r AS (
  SELECT qid, doc_id, rrf_score,
         row_number() OVER (
           PARTITION BY qid ORDER BY rrf_score DESC, doc_id
         ) AS rank
  FROM fused
)
SELECT qid, doc_id, round(rrf_score, 6) AS rrf_score, rank
FROM r WHERE rank <= {MULTI_K}
"""

_LABELS_SQL = ", ".join(str(x) for x in ALLOWED_LABELS)

_FILTERED_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 10 = 0
),
d AS (
  SELECT q.qid, b.vec_id AS id,
         list_distance(q.qv, CAST(b.embedding AS DOUBLE[])) AS dist
  FROM q CROSS JOIN embeddings b
  WHERE b.label IN ({_LABELS_SQL})
),
r AS (
  SELECT qid, id,
         row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
  FROM d
)
SELECT qid, id, rank FROM r WHERE rank <= {K}
"""

# post-filter adapter over the exact (exhaustive-graph) ranking:
# unfiltered rank ≤ K×oversample, keep allowed labels, re-rank
_FILTERED_POSTFILTER_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 10 = 0
),
d AS (
  SELECT q.qid, b.vec_id AS id, b.label,
         list_distance(q.qv, CAST(b.embedding AS DOUBLE[])) AS dist
  FROM q CROSS JOIN embeddings b
),
r AS (
  SELECT qid, id, label, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
  FROM d
),
kept AS (
  SELECT qid, id, dist FROM r
  WHERE rank <= {K * POSTFILTER_OVERSAMPLE} AND label IN ({{labels}})
),
rr AS (
  SELECT qid, id,
         row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
  FROM kept
)
SELECT qid, id, rank FROM rr WHERE rank <= {K}
"""

# ivf_fixed_search's oracle (ann.py _IVF_SEARCH_ORACLE) with the
# pre-filter: candidates keep probed-cluster membership AND the label
# predicate — rank among survivors, exactly the kernel's mask-then-topk
_FILTERED_IVF_ORACLE = f"""
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
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 10 = 0
),
probe AS (
  SELECT qid, cid AS cluster_id FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (
             PARTITION BY q.qid ORDER BY list_distance(q.qv, c.cv), c.cid
           ) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= {NPROBE_FIXED}
),
cand AS (
  SELECT p.qid, a.id
  FROM probe p
  JOIN assign a ON a.cluster_id = p.cluster_id
  JOIN embeddings bl ON bl.vec_id = a.id AND bl.label IN ({_LABELS_SQL})
),
rr AS (
  SELECT cand.qid, cand.id,
         row_number() OVER (
           PARTITION BY cand.qid
           ORDER BY list_distance(q2.qv, CAST(be.embedding AS DOUBLE[])), cand.id
         ) AS rank
  FROM cand
  JOIN q q2 ON q2.qid = cand.qid
  JOIN embeddings be ON be.vec_id = cand.id
)
SELECT qid, id, rank FROM rr WHERE rank <= {K}
"""

def bm25_fullrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus BM25 ranking (top_n=None) — exercises the
    DISTRIBUTED global-rank path (text_retrieval.global_rank: range
    sort + per-partition row_number + cumulative offsets), the
    round-8 advisor fix for the former single-partition window."""
    res = bm25_rank(
        _docs(spark, sf_dir), TERMS, top_n=None, round_scores=6
    )
    return res.select("doc_id", "score", "rank").orderBy("doc_id")


_BM25_FULLRANK_ORACLE = f"""
WITH {_BM25_COMMON},
r AS (SELECT doc_id, round(score, 6) AS score FROM bm25)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM r ORDER BY doc_id
"""

QUERIES = {
    "bm25_topk": bm25_topk,
    "bm25_fullrank": bm25_fullrank,
    "bm25_multiquery": bm25_multiquery,
    "bm25_indexed_search": bm25_indexed_search,
    "hybrid_rrf": hybrid_rrf,
    "hybrid_multiquery": hybrid_multiquery,
    "filtered_knn_exact": filtered_knn_exact,
    "filtered_ivf_search": filtered_ivf_search,
    "filtered_graph_postfilter": filtered_graph_postfilter,
}

ORACLES = {
    "bm25_topk": _BM25_ORACLE,
    "bm25_fullrank": _BM25_FULLRANK_ORACLE,
    "bm25_multiquery": _BM25_MULTI_ORACLE,
    "bm25_indexed_search": _BM25_MULTI_ORACLE,
    "hybrid_rrf": _HYBRID_ORACLE,
    "hybrid_multiquery": _HYBRID_MULTI_ORACLE,
    "filtered_knn_exact": _FILTERED_KNN_ORACLE,
    "filtered_ivf_search": _FILTERED_IVF_ORACLE,
    "filtered_graph_postfilter": _FILTERED_POSTFILTER_ORACLE.format(
        labels=_LABELS_SQL
    ),
}
