"""Generic filtered-search adapter for index families without a native
pre-filter path.

``IVFSearcher`` (and the exact path) pre-filter: the allowed-id mask
applies inside the scan, before top-k selection — every emitted row
satisfies the predicate and recall is controlled by probe scaling
(ivf.py docstring).  Graph / LSH / cluster-pruned searchers traverse
structures whose connectivity depends on the full corpus, so masking
inside the walk would change the structure itself; the industry answer
(and FAISS's for graph indexes) is POST-filtering with oversampling:
search k×oversample unfiltered, drop disallowed, re-rank.

Semantics are explicit: a query returns FEWER than k rows when fewer
than k of its k×oversample unfiltered neighbors are allowed — the
caller chooses oversample by filter selectivity (≈ k/selectivity keeps
the expected fill at k).  Results that do appear are exactly the
allowed members of the unfiltered top-(k×oversample), re-ranked by
(dist, id) — fully reproducible in SQL, so the adapter is
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def post_filtered_search(
    searcher,
    query_df: DataFrame,
    k: int,
    allowed_df: DataFrame,
    *,
    oversample: int = 4,
    allowed_id_col: str = "id",
    qid_col: str = "qid",
    vec_col: str = "vec",
) -> DataFrame:
    """Search ``k × oversample`` through any attached searcher, keep the
    allowed ids, re-rank to top-k per query.  One extra semi-join +
    qid-window over the (small) oversampled result — no change to the
    underlying search plan."""
    raw = searcher.search(
        query_df, k * oversample, qid_col=qid_col, vec_col=vec_col
    )
    # no broadcast hint: the allowed set can be corpus-sized while the
    # oversampled result is n_q × k × oversample rows — AQE picks the
    # small side (usually the result) for the semi-join build
    allowed = allowed_df.select(F.col(allowed_id_col).alias("id"))
    kept = raw.join(allowed, "id", "left_semi")
    w = Window.partitionBy("qid").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    return (
        kept.withColumn("new_rank", F.row_number().over(w))
        .filter(F.col("new_rank") <= k)
        .select("qid", "id", "dist", F.col("new_rank").alias("rank"))
    )
