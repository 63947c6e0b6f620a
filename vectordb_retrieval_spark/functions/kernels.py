"""Arrow-batched NumPy kernels shared by the searchers.

``attach_query_distance`` is the workhorse of every candidate-rerank
path (LSH rerank, IVF probe scoring): given candidate rows
(qid, id, vec) and a broadcast query matrix, it appends the exact
distance qid↔vec without materializing a q×n matrix — one vectorized
row-wise computation per Arrow batch, JVM→Arrow→NumPy→Arrow.
"""

from __future__ import annotations

import weakref
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vectordb_retrieval_spark.functions.distance import normalize_rows


def collect_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collect of a (small) vector table → (ids, float32 matrix)."""
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float32)
    return ids, mat


# DataFrames are immutable, so a collect keyed on DataFrame identity can
# never serve stale data; WeakKey keeps the memo from pinning query
# tables after callers drop them.  Serving paths collect the same query
# batch once per SEARCH otherwise — at high search rates the repeated
# toPandas job is pure fixed cost.
_collect_memo: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def collect_vectors_cached(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """``collect_vectors`` with a WeakKey memo on the DataFrame object.
    Falls back to a plain collect for unhashable/unweakrefable frames
    (e.g. future client implementations)."""
    key = (id_col, vec_col)
    try:
        per_df = _collect_memo.get(df)
        if per_df is not None and key in per_df:
            return per_df[key]
    except TypeError:
        return collect_vectors(df, id_col, vec_col)
    out = collect_vectors(df, id_col, vec_col)
    try:
        if per_df is None:
            per_df = {}
            _collect_memo[df] = per_df
        per_df[key] = out
    except TypeError:
        pass
    return out


def rowwise_distance(
    qvecs: np.ndarray, bvecs: np.ndarray, metric: str
) -> np.ndarray:
    """Per-row distance between aligned (n, d) arrays, float64."""
    q = qvecs.astype(np.float64)
    b = bvecs.astype(np.float64)
    if metric == "l2":
        d = q - b
        return np.sqrt((d * d).sum(axis=1))
    if metric == "cosine":
        return 1.0 - (normalize_rows(q) * normalize_rows(b)).sum(axis=1)
    if metric == "ip":
        return -(q * b).sum(axis=1)
    raise ValueError(f"unknown metric {metric!r}")


def cluster_scan_topk(
    assignment: DataFrame,
    qids: np.ndarray,
    qmat: np.ndarray,
    probe_map: dict[int, np.ndarray],
    metric: str,
    k: int,
    accum=None,
    codec=None,
    payload_col: str = "vec",
) -> DataFrame:
    """Scan the probed clusters of an IVF-style assignment table and
    return fragment-local top-k rows (qid, id, dist).

    ``probe_map`` is cluster_id → query-row indices probing it.  Each
    base row crosses Arrow once per cluster; one GEMM scores it against
    all its probing queries.  Fragment top-ks are FUSED per task: the
    kernel folds every probed cluster a task holds into one per-query
    running top-k and emits it once at task end, so the caller's final
    window sees ≤ n_q × tasks_probed × k rows instead of
    n_q × nprobe × k — the probe fan-in merge happens map-side.
    The probed ids double as a literal IN filter, which becomes a static
    partition filter on a cluster_id-partitioned index.  ``accum``
    counts exact distance computations (the reference's ``ndis``)."""
    from vectordb_retrieval_spark.functions.distance import pairwise_distances
    from pyspark.sql import functions as F

    spark = assignment.sparkSession
    probed_ids = sorted(int(c) for c in probe_map)
    bc = spark.sparkContext.broadcast((qids, qmat, codec, probe_map))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # local import: operators.serving depends on functions.*, so the
        # reverse import stays out of module scope
        from vectordb_retrieval_spark.operators.serving import topk_rows

        q_ids, q_mat, cdc, probes = bc.value
        acc_q: list[np.ndarray] = []
        acc_i: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for cid, grp in pdf.groupby("cluster_id", sort=False):
                qrows = probes.get(int(cid))
                if qrows is None or len(grp) == 0:
                    continue
                raw = np.vstack(grp[payload_col].to_numpy())
                bvecs = raw.astype(np.float32) if cdc is None else cdc.decode(raw)
                ids = grp["id"].to_numpy(dtype=np.int64)
                d = pairwise_distances(q_mat[qrows], bvecs, metric)
                if accum is not None:
                    accum.add(int(d.size))
                kk = min(k, d.shape[1])
                # tie-safe partial selection (argpartition + boundary
                # re-rank) instead of a full per-row lexsort — identical
                # lexicographic (dist, id) output, O(n) per row
                od, oi = topk_rows(d, ids, kk)
                acc_q.append(np.repeat(qrows, kk))
                acc_i.append(oi.ravel())
                acc_d.append(od.ravel())
        if not acc_q:
            return
        aq = np.concatenate(acc_q)
        ai = np.concatenate(acc_i)
        ad = np.concatenate(acc_d)
        order = np.lexsort((ai, ad, aq))
        aq, ai, ad = aq[order], ai[order], ad[order]
        starts = np.r_[0, np.nonzero(np.diff(aq))[0] + 1]
        counts = np.diff(np.r_[starts, len(aq)])
        rank = np.arange(len(aq)) - np.repeat(starts, counts)
        keep = rank < k
        yield pd.DataFrame(
            {"qid": q_ids[aq[keep]], "id": ai[keep], "dist": ad[keep]}
        )

    return (
        assignment.filter(F.col("cluster_id").isin(probed_ids))
        .select("cluster_id", "id", payload_col)
        .mapInPandas(kernel, schema="qid long, id long, dist double")
    )


def attach_query_distance(
    candidates: DataFrame,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    metric: str,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """candidates(qid, id, vec, ...) → (qid, id, dist) with the exact
    query↔vector distance, computed batch-vectorized against the
    broadcast query matrix."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((query_ids, query_mat))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids, q_mat = bc.value
        lookup = {int(q): i for i, q in enumerate(q_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = pdf[qid_col].map(lookup).to_numpy(dtype=np.int64)
            bvecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float32)
            dist = rowwise_distance(q_mat[rows], bvecs, metric)
            yield pd.DataFrame(
                {
                    "qid": pdf[qid_col].to_numpy(dtype=np.int64),
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "dist": dist,
                }
            )

    return candidates.select(qid_col, id_col, vec_col).mapInPandas(
        kernel, schema="qid long, id long, dist double"
    )
