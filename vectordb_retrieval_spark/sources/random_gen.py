"""Seeded random vector dataset generator.

Reference counterpart: ``_generate_random_dataset`` (dataset.py:473-504)
— Gaussian base+query vectors with brute-force ground truth.

Spark-first design: vectors are generated **on executors**, one
counter-based RNG stream per row (``np.random.Philox`` keyed by
``(seed, row_id)``), so the output is bit-identical regardless of
partitioning, task retries, or cluster size — the distributed analogue
of the reference's single ``RandomState(seed)``.  No data ever sits on
the driver; generating 10^9 rows is the same code as 10^4.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from vectordb_retrieval_spark.operators.exact import ground_truth


def random_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    seed: int = 42,
    stream: int = 0,
    id_col: str = "id",
    vec_col: str = "vec",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, vec): n standard-Gaussian float32 vectors, deterministic in
    (seed, stream) and independent of physical partitioning."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vecs = [
                np.random.Generator(
                    np.random.Philox(np.random.SeedSequence([seed, stream, int(i)]))
                ).standard_normal(dim, dtype=np.float32)
                for i in ids
            ]
            yield pd.DataFrame({id_col: ids, vec_col: vecs})

    rng = spark.range(n, numPartitions=num_partitions)
    return rng.mapInPandas(kernel, schema=f"{id_col} long, {vec_col} array<float>")


def clustered_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    n_clusters: int = 100,
    spread: float = 0.3,
    seed: int = 42,
    stream: int = 0,
    id_col: str = "id",
    vec_col: str = "vec",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, vec): Gaussian-mixture float32 vectors — row i belongs to
    cluster ``i % n_clusters`` whose center is a unit-scale Gaussian
    draw, plus ``spread``-scaled noise.

    Models real embedding corpora (e.g. the reference's MS MARCO
    MiniLM vectors), which are clustered — the regime where IVF-style
    partition pruning actually pays off; uniform Gaussians at high dim
    have no structure to prune.  Same Philox counter-RNG contract as
    ``random_vectors``: bit-identical output for any partitioning, and
    centers derive from (seed, CENTER_STREAM, cluster) so base and
    query sets share mixture components across independent streams."""
    CENTER_STREAM = 1 << 30

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = np.stack(
            [
                np.random.Generator(
                    np.random.Philox(
                        np.random.SeedSequence([seed, CENTER_STREAM, c])
                    )
                ).standard_normal(dim, dtype=np.float32)
                for c in range(n_clusters)
            ]
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vecs = [
                centers[int(i) % n_clusters]
                + spread
                * np.random.Generator(
                    np.random.Philox(np.random.SeedSequence([seed, stream, int(i)]))
                ).standard_normal(dim, dtype=np.float32)
                for i in ids
            ]
            yield pd.DataFrame({id_col: ids, vec_col: vecs})

    rng = spark.range(n, numPartitions=num_partitions)
    return rng.mapInPandas(kernel, schema=f"{id_col} long, {vec_col} array<float>")


def random_dataset(
    spark: SparkSession,
    train_size: int = 20_000,
    test_size: int = 256,
    dimensions: int = 64,
    ground_truth_k: int = 200,
    seed: int = 42,
    metric: str = "l2",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, gt): the reference's random dataset triple
    (dataset.py:473-504) — queries come from an independent RNG stream,
    ground truth is built by the exact-kNN operator (which doubles as
    the engine's correctness oracle)."""
    train = random_vectors(spark, train_size, dimensions, seed, stream=0)
    test = random_vectors(
        spark, test_size, dimensions, seed, stream=1, id_col="qid"
    )
    gt = ground_truth(
        train, test, ground_truth_k, metric, qid_col="qid", qvec_col="vec"
    )
    return train, test, gt
