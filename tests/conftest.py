from __future__ import annotations

import numpy as np
import pytest

from vectordb_retrieval_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("vectordb-retrieval-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tiny_vectors():
    """F1 tiny_random fixture shape: 32 base × 3-d, 6 queries, seed 123."""
    rng = np.random.RandomState(123)
    base = rng.randn(32, 3).astype(np.float32)
    queries = rng.randn(6, 3).astype(np.float32)
    return base, queries


def make_vector_df(spark, mat, id_name="id", vec_name="vec"):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        schema=f"{id_name} long, {vec_name} array<float>",
    )
