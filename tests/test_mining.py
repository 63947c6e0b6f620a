"""Unit tests for contrastive-pair (hard-negative) mining."""

from __future__ import annotations

import pytest

from vectordb_retrieval_spark.operators.mining import mine_hard_negatives

# anchor 0 shares words with docs 1 and 2 (lexical positives) and its
# embedding is close to docs 3 and 4 (dense hard negatives); docs 5/6
# are unrelated in both spaces
_DOCS = [
    (0, "spark window shuffle join"),
    (1, "spark window shuffle join extra"),     # strongest BM25 match
    (2, "spark window other words here"),       # weaker BM25 match
    (3, "completely different tokens one"),     # dense-only neighbor
    (4, "completely different tokens two"),     # dense-only neighbor
    (5, "unrelated filler alpha beta"),
    (6, "unrelated filler gamma delta"),
]


def _emb_rows():
    rows = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],     # lexical positive, dense-far
        2: [0.0, 0.0, 1.0, 0.0],     # lexical positive, dense-far
        3: [0.99, 0.1, 0.0, 0.0],    # dense-near
        4: [0.98, 0.15, 0.0, 0.0],   # dense-near
        5: [0.0, 0.0, 0.0, 1.0],
        6: [0.0, 0.5, 0.5, 0.0],
    }
    return [(i, v) for i, v in rows.items()]


@pytest.fixture(scope="module")
def mining_tables(spark):
    d = spark.createDataFrame(_DOCS, schema="doc_id long, text string")
    e = spark.createDataFrame(
        _emb_rows(), schema="vec_id long, embedding array<float>"
    )
    return d, e


def test_mine_hard_negatives_roles_and_exclusions(spark, mining_tables):
    d, e = mining_tables
    anchors = spark.createDataFrame([(0,)], schema="qid long")
    out = mine_hard_negatives(d, e, anchors, n_pos=2, n_neg=2).collect()
    pos = sorted((r.rank, r.doc_id) for r in out if r.role == "pos")
    neg = sorted((r.rank, r.doc_id) for r in out if r.role == "neg")
    # positives: docs sharing the anchor's words, anchor itself excluded
    assert pos == [(1, 1), (2, 2)]
    # hard negatives: dense-nearest after dropping anchor + positives
    assert neg == [(1, 3), (2, 4)]
    # never the anchor itself anywhere
    assert all(r.doc_id != 0 for r in out)


def test_mine_hard_negatives_counts_per_anchor(spark, mining_tables):
    d, e = mining_tables
    anchors = spark.createDataFrame([(0,), (5,)], schema="qid long")
    out = mine_hard_negatives(d, e, anchors, n_pos=1, n_neg=3).toPandas()
    counts = out.groupby(["qid", "role"]).size().to_dict()
    assert counts[(0, "pos")] == 1 and counts[(0, "neg")] == 3
    assert counts[(5, "neg")] == 3
    # ranks are 1..n within each (qid, role)
    for (_, _), grp in out.groupby(["qid", "role"]):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
    # positives and negatives never overlap per anchor
    for qid, grp in out.groupby("qid"):
        p = set(grp[grp.role == "pos"]["doc_id"])
        n = set(grp[grp.role == "neg"]["doc_id"])
        assert not p & n
