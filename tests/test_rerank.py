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


def test_mmr_rerank_matches_python_greedy(spark):
    """mmr_rerank == a pure-python greedy MMR, and diversification is
    visible: a near-duplicate of the top hit is deferred below a less
    relevant but novel candidate."""
    import numpy as np

    from vectordb_retrieval_spark.operators.rerank import mmr_rerank

    vecs = {
        10: [10.0, 0.0],   # top relevance
        11: [9.9, 0.1],    # near-duplicate of 10
        12: [0.0, 8.0],    # novel direction, lower relevance
        13: [1.0, 7.0],    # close to 12
    }
    q = np.array([1.0, 0.5])
    rows = [
        (0, d, float(np.dot(q, v)), [float(x) for x in v])
        for d, v in vecs.items()
    ]
    df = spark.createDataFrame(
        rows, "qid long, doc_id long, rel double, vec array<double>"
    )
    got = [
        (r.doc_id, r.mmr_rank)
        for r in mmr_rerank(df, k=4, lambda_=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]

    def py_mmr(lam, k):
        ids = sorted(vecs)
        rel = {d: float(np.dot(q, vecs[d])) for d in ids}
        sim = {
            (a, b): float(np.dot(vecs[a], vecs[b])) for a in ids for b in ids
        }
        picked = []
        while len(picked) < k:
            best, best_s = None, None
            for d in ids:
                if d in picked:
                    continue
                ms = max((sim[(d, p)] for p in picked), default=None)
                s = lam * rel[d] - (1 - lam) * ms if picked else lam * rel[d]
                if best is None or s > best_s or (s == best_s and d < best):
                    best, best_s = d, s
            picked.append(best)
        return picked

    assert [d for d, _ in got] == py_mmr(0.5, 4)
    # diversification: the near-dup 11 is NOT rank 2
    assert got[0][0] == 10 and got[1][0] != 11
    # lambda=1 degenerates to pure relevance order
    pure = [
        r.doc_id
        for r in mmr_rerank(df, k=4, lambda_=1.0).orderBy("mmr_rank").collect()
    ]
    assert pure == sorted(vecs, key=lambda d: -float(np.dot(q, vecs[d])))
