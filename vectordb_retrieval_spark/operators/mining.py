"""Contrastive-pair mining for embedding-model training data.

The DPR/ANCE training-prep step (Karpukhin et al. 2020; Xiong et al.
2021): for each anchor document, positives come from lexical (BM25)
retrieval and HARD negatives from dense nearest-neighbor retrieval with
the positives excluded — semantically close, lexically unjustified.
No analogue exists in the reference repo; this composes the engine's
own BM25 and exact-kNN operators, so the whole mining pipeline stays
inside hash-checked, already-scale-shaped primitives.

Exclusion math: the lexical side retrieves ``n_pos + 1`` (the anchor
itself can appear anywhere, including nowhere); the dense side
retrieves ``n_pos + n_neg + 1`` so after dropping the anchor and up to
``n_pos`` positives the surviving prefix is exactly the true top
``n_neg`` of the excluded ranking — no re-query needed.

Scale shape: BM25 is the batched search (query terms broadcast, one tf
shuffle); the dense side is the GEMM exact kernel over the anchor
batch; exclusions are qid-partitioned anti-joins and windows.  At
100 TB swap exact_knn for any §2.8 ANN searcher — the contract
(qid, id, rank) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import tokens_expr
from vectordb_retrieval_spark.operators.exact import exact_knn
from vectordb_retrieval_spark.operators.text_retrieval import bm25_search


def mine_hard_negatives(
    docs: DataFrame,
    emb: DataFrame,
    anchor_ids: DataFrame,
    n_pos: int = 3,
    n_neg: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, doc_id, role, rank): per anchor, ``n_pos`` BM25 positives
    (role='pos') and ``n_neg`` dense-cosine hard negatives (role='neg',
    anchor and positives excluded), each re-ranked 1..n within role.

    ``anchor_ids`` carries one column ``qid``; anchors must exist in
    both tables (documents supply the query term bag, embeddings the
    query vector)."""
    anchors = anchor_ids.select(F.col("qid").cast("long").alias("qid"))
    qdf = (
        docs.join(anchors, docs[id_col] == anchors["qid"], "inner")
        .select(
            "qid",
            F.array_sort(F.array_distinct(tokens_expr(F.col(text_col)))).alias(
                "terms"
            ),
        )
    )
    lex = bm25_search(
        docs, qdf, id_col=id_col, text_col=text_col, k=n_pos + 1
    )
    w = Window.partitionBy("qid").orderBy("rank")
    pos = (
        lex.filter(F.col("doc_id") != F.col("qid"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_pos)
        .select("qid", "doc_id", F.col("r").alias("rank"))
    )

    qv = emb.join(anchors, emb[vec_id_col] == anchors["qid"], "inner").select(
        "qid", F.col(vec_col).alias("qvec")
    )
    dense = exact_knn(
        emb,
        qv,
        n_pos + n_neg + 1,
        "cosine",
        id_col=vec_id_col,
        vec_col=vec_col,
        qid_col="qid",
        qvec_col="qvec",
    )
    neg = (
        dense.filter(F.col("id") != F.col("qid"))
        .join(
            pos.select("qid", F.col("doc_id").alias("id")),
            on=["qid", "id"],
            how="left_anti",
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_neg)
        .select("qid", F.col("id").alias("doc_id"), F.col("r").alias("rank"))
    )
    return pos.withColumn("role", F.lit("pos")).unionByName(
        neg.withColumn("role", F.lit("neg"))
    ).select("qid", "doc_id", "role", "rank")
