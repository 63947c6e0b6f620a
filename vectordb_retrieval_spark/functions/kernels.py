"""Arrow-batched NumPy kernels shared by the searchers.

``attach_query_distance`` is the workhorse of every candidate-rerank
path (LSH rerank, IVF probe scoring): given candidate rows
(qid, id, vec) and a broadcast query matrix, it appends the exact
distance qid↔vec without materializing a q×n matrix — one vectorized
row-wise computation per Arrow batch, JVM→Arrow→NumPy→Arrow.
"""

from __future__ import annotations

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
