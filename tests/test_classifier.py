"""Unit tests for the weak-label NB quality classifier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.classifier import nb_quality_classifier

# "good" docs: 25+ short common words incl. stopwords, no dominant
# token; "bad" docs: too short / one token repeated
_GOOD_BODY = (
    "the data moves through the plan and the engine keeps it sorted "
    "while every stage of the job reads only what it needs to read"
)
_BAD_SHORT = "tiny doc"
_BAD_REPEAT = "spam " * 30 + "the and is"


@pytest.fixture(scope="module")
def labeled_corpus(spark):
    rows = [(i, f"{_GOOD_BODY} tail{i}") for i in range(8)]
    rows += [(100, _BAD_SHORT), (101, _BAD_REPEAT.strip()), (102, "x y z")]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_nb_classifier_separates_weak_labels(spark, labeled_corpus):
    out = {r.doc_id: r for r in nb_quality_classifier(labeled_corpus).collect()}
    # weak labels: good docs pass every rule, bad ones fail at least one
    assert all(out[i].label == 1 for i in range(8))
    assert all(out[i].label == 0 for i in (100, 101, 102))
    # the trained classifier reproduces the separable labeling
    agree = sum(1 for r in out.values() if r.pred == r.label)
    assert agree >= len(out) - 1  # allow one boundary doc
    # scores are finite and signed consistently for clear cases
    assert out[0].score > 0 and out[101].score < 0


def test_nb_classifier_single_class_raises(spark):
    df = spark.createDataFrame(
        [(0, "tiny"), (1, "also tiny")], schema="doc_id long, text string"
    )
    with pytest.raises(ValueError, match="single-class"):
        nb_quality_classifier(df)


def test_roc_curve_matches_manual(spark):
    """ROC curve vs a hand-computed cumulative table, including a score
    tie that must stay one threshold group."""
    from vectordb_retrieval_spark.operators.classifier import roc_curve

    rows = [  # (label, score)
        (1, 0.9), (0, 0.9), (1, 0.7), (1, 0.5), (0, 0.3), (0, 0.1),
    ]
    df = spark.createDataFrame(rows, "label long, score double")
    got = [
        tuple(r)
        for r in roc_curve(df).orderBy(F.col("score").desc()).collect()
    ]
    want = [
        (0.9, 1, 1, 2, 2),   # threshold 0.9: tp=1 fp=1
        (0.7, 2, 1, 1, 2),
        (0.5, 3, 1, 0, 2),
        (0.3, 3, 2, 0, 1),
        (0.1, 3, 3, 0, 0),
    ]
    assert got == want
    # trapezoid AUC from the curve: this labeling's true AUC
    pts = [(0.0, 0.0)] + [(fp / 3, tp / 3) for _, tp, fp, _, _ in got]
    auc = sum(
        (x2 - x1) * (y1 + y2) / 2
        for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    assert abs(auc - (6.5 / 9)) < 1e-9
