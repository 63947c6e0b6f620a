"""Metrics suite vs hand-computed values (reference: metrics.py tests semantics)."""

from __future__ import annotations

import math

import pytest


def make_ranked(spark, rows):
    return spark.createDataFrame(rows, schema="qid long, id long, rank int")


def test_perfect_prediction_is_all_ones(spark):
    from vectordb_retrieval_spark.metrics import retrieval_metrics

    gt = make_ranked(spark, [(0, 10, 1), (0, 11, 2), (1, 20, 1), (1, 21, 2)])
    m = retrieval_metrics(gt, gt, 2).collect()[0]
    assert m["recall"] == 1.0 and m["precision"] == 1.0
    assert m["map"] == pytest.approx(1.0)
    assert m["ndcg"] == pytest.approx(1.0)
    assert m["hit_rate"] == 1.0 and m["mrr"] == 1.0
    assert m["n_queries"] == 2


def test_hand_computed_case(spark):
    from vectordb_retrieval_spark.metrics import retrieval_metrics

    # q0: pred [10, 99, 11] vs gt {10,11,12}: hits at ranks 1,3
    # q1: pred [98, 97, 96] vs gt {20,21,22}: no hits
    gt = make_ranked(
        spark,
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2), (1, 22, 3)],
    )
    pred = make_ranked(
        spark, [(0, 10, 1), (0, 99, 2), (0, 11, 3), (1, 98, 1), (1, 97, 2), (1, 96, 3)]
    )
    m = retrieval_metrics(pred, gt, 3).collect()[0]
    assert m["recall"] == pytest.approx((2 / 3 + 0) / 2)
    assert m["precision"] == pytest.approx((2 / 3 + 0) / 2)
    # q0 AP = (1/1 + 2/3) / 3
    assert m["map"] == pytest.approx(((1 + 2 / 3) / 3) / 2)
    dcg0 = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert m["ndcg"] == pytest.approx((dcg0 / idcg) / 2)
    assert m["hit_rate"] == 0.5
    assert m["mrr"] == pytest.approx((1 + 0) / 2)


def test_missing_query_counts_as_zero(spark):
    from vectordb_retrieval_spark.metrics import retrieval_metrics

    gt = make_ranked(spark, [(0, 1, 1), (1, 2, 1)])
    pred = make_ranked(spark, [(0, 1, 1)])  # q1 absent from predictions
    m = retrieval_metrics(pred, gt, 1).collect()[0]
    assert m["n_queries"] == 2
    assert m["recall"] == 0.5
    assert m["hit_rate"] == 0.5


def test_deep_gt_full_set_semantics(spark):
    """Reference parity (src/benchmark/metrics.py): with GT deeper than
    k, only recall truncates GT at k — precision/MAP/NDCG/hit_rate/MRR
    mark hits against the FULL GT set."""
    from vectordb_retrieval_spark.metrics import (
        retrieval_metrics,
        retrieval_metrics_multi,
    )

    gt = make_ranked(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    pred = make_ranked(spark, [(0, 11, 1)])  # in full GT, not in gt@1
    m = retrieval_metrics(pred, gt, 1).collect()[0]
    assert m["recall"] == 0.0  # gt@1 = {10}
    assert m["precision"] == 1.0  # full GT hit / k
    assert m["map"] == pytest.approx(1 / 3)  # (1/1) / |gt_full|
    assert m["ndcg"] == pytest.approx(1.0)  # dcg=1, idcg(min(3,1))=1
    assert m["hit_rate"] == 1.0 and m["mrr"] == 1.0

    rows = {r["k"]: r for r in retrieval_metrics_multi(pred, gt, [1]).collect()}
    assert rows[1]["recall"] == 0.0 and rows[1]["precision"] == 1.0
    assert rows[1]["map"] == pytest.approx(1 / 3)


def test_multi_k_sweep(spark):
    from vectordb_retrieval_spark.metrics import retrieval_metrics_multi

    gt = make_ranked(spark, [(0, 1, 1), (0, 2, 2)])
    pred = make_ranked(spark, [(0, 2, 1), (0, 1, 2)])
    rows = {r["k"]: r for r in retrieval_metrics_multi(pred, gt, [1, 2]).collect()}
    assert rows[1]["recall"] == 0.0  # top-1 pred (id 2) not in top-1 gt (id 1)
    assert rows[2]["recall"] == 1.0


def test_latency_stats(spark):
    from vectordb_retrieval_spark.metrics import latency_stats

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "t double")
    r = latency_stats(df, "t").collect()[0]
    assert r["n"] == 100 and r["min"] == 1.0 and r["max"] == 100.0
    assert r["mean"] == pytest.approx(50.5)
    assert r["p50"] == pytest.approx(50.5)
    assert r["p95"] == pytest.approx(95.05)
