"""Degenerate-input hardening: empty serving batches, single-row
corpora, nlist larger than the corpus, empty streams.  A long-running
serving deployment will see all of these."""

from __future__ import annotations

from vectordb_retrieval_spark.operators.exact import exact_knn, exact_range_search
from vectordb_retrieval_spark.operators.temporal import asof_join, sessionize


def _base(spark, n=5):
    return spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(n)], "id long, vec array<float>"
    )


def test_exact_empty_query_batch(spark):
    q0 = spark.createDataFrame([], "qid long, vec array<float>")
    res = exact_knn(_base(spark), q0, 3, "l2", qid_col="qid", qvec_col="vec")
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == ["qid", "id", "dist", "rank"]
    assert exact_range_search(
        _base(spark), q0, 1.0, "l2", qid_col="qid", qvec_col="vec"
    ).count() == 0


def test_exact_corpus_smaller_than_k(spark):
    q = spark.createDataFrame([(9, [0.0, 0.0])], "qid long, vec array<float>")
    res = exact_knn(_base(spark, 1), q, 3, "l2", qid_col="qid", qvec_col="vec")
    assert res.count() == 1  # unpadded: only the one real neighbor
    padded = exact_knn(
        _base(spark, 1), q, 3, "l2", qid_col="qid", qvec_col="vec", pad=True
    )
    rows = sorted(padded.collect(), key=lambda r: r.rank)
    assert len(rows) == 3 and rows[1].id == -1 and rows[2].id == -1


def test_ivf_nlist_exceeds_corpus(spark):
    from vectordb_retrieval_spark.operators.ivf import IVFIndexer, IVFSearcher

    q = spark.createDataFrame([(9, [0.0, 0.0])], "qid long, vec array<float>")
    art = IVFIndexer(nlist=16, seed=1).build(_base(spark))
    res = IVFSearcher(nprobe=16).attach(art).search(q, 3)
    assert res.count() == 3


def test_temporal_empty_inputs(spark):
    empty = spark.createDataFrame([], "event_id long, user_id long, ts timestamp")
    assert sessionize(empty).count() == 0
    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:00")], "event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) as ts")
    r = asof_join(left, empty, right_payload=("event_id",)).collect()
    assert [(x.event_id, x.asof_event_id) for x in r] == [(1, None)]
