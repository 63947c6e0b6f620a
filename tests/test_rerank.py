"""Unit tests for the retrieve-then-rerank stage."""

from __future__ import annotations

import pytest

from vectordb_retrieval_spark.operators.rerank import (
    cross_encoder_rerank,
    jaccard_rerank,
)

_DOCS = [
    (0, "spark window shuffle join"),
    (1, "spark window shuffle join spark window"),  # same SET as 0
    (2, "spark window other words"),
    (3, "nothing in common here"),
]


@pytest.fixture(scope="module")
def rerank_tables(spark):
    d = spark.createDataFrame(_DOCS, schema="doc_id long, text string")
    q = spark.createDataFrame(
        [(7, ["spark", "window", "shuffle", "join"], "spark window shuffle join")],
        schema="qid long, terms array<string>, qtext string",
    )
    cands = spark.createDataFrame(
        [(7, i) for i, _ in _DOCS], schema="qid long, doc_id long"
    )
    return d, q, cands


def test_jaccard_rerank_scores_and_ties(spark, rerank_tables):
    d, q, cands = rerank_tables
    out = {r.doc_id: r for r in jaccard_rerank(cands, d, q, top_k=4).collect()}
    # docs 0 and 1 have identical token SETS -> identical score 1.0,
    # tie broken by doc_id
    assert out[0].score == 1.0 and out[0].rank == 1
    assert out[1].score == 1.0 and out[1].rank == 2
    # doc 2: |∩|=2, |∪|=6
    assert abs(out[2].score - 2 / 6) < 1e-12 and out[2].rank == 3
    # doc 3: disjoint
    assert out[3].score == 0.0 and out[3].rank == 4


def test_jaccard_rerank_top_k_cuts(spark, rerank_tables):
    d, q, cands = rerank_tables
    out = jaccard_rerank(cands, d, q, top_k=2).collect()
    assert sorted(r.doc_id for r in out) == [0, 1]


def test_cross_encoder_stub_counts_overlap(spark, rerank_tables):
    d, q, cands = rerank_tables
    out = {
        r.doc_id: r
        for r in cross_encoder_rerank(
            cands, d, q, top_k=4, model_name="overlap-stub"
        ).collect()
    }
    # overlap COUNT, not Jaccard: doc 0 and 1 both share all 4 words
    assert out[0].score == 4.0 and out[1].score == 4.0
    assert out[2].score == 2.0
    assert out[3].score == 0.0
    assert [out[i].rank for i in (0, 1, 2, 3)] == [1, 2, 3, 4]


def test_cross_encoder_real_branch_gate(spark, rerank_tables):
    d, q, cands = rerank_tables
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        cross_encoder_rerank(
            cands, d, q, top_k=2, model_name="cross-encoder/ms-marco-MiniLM-L-6-v2"
        ).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
