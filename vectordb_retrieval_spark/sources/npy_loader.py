"""NumPy ``.npy`` 2-D array loader → vector DataFrame.

Reference counterpart: the MS MARCO pre-embedded ``.npy`` path
(dataset.py:966-1108) — ``passage_embeddings.npy`` /
``query_embeddings.npy``, optionally memmapped, with ``base_limit`` /
``query_limit`` prefix slices.

Spark-first: the file is memmapped on the driver (no full read), row
ranges are distributed, and each task materializes only its slice —
so a 100 GB .npy converts to Parquet with driver memory ~0.  Prefix
limits become range bounds (the reference's ``[:n]`` slice).  Like the
fvecs reader, this is the ingestion edge; steady state is Parquet
(``convert_npy_to_parquet``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_npy_vectors(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    id_col: str = "id",
    vec_col: str = "vec",
    rows_per_task: int = 50_000,
) -> DataFrame:
    """(id, vec) rows from a 2-D float .npy file; ids are row positions.

    ``limit`` keeps the first n rows (reference ``base_limit``/
    ``query_limit`` semantics, dataset.py:1034-1037)."""
    header = np.lib.format.open_memmap(path, mode="r")
    if header.ndim != 2:
        raise ValueError(f"{path}: expected 2-D array, got shape {header.shape}")
    n = header.shape[0] if limit is None else min(limit, header.shape[0])
    del header

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mm = np.lib.format.open_memmap(path, mode="r")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            block = np.asarray(mm[ids], dtype=np.float32)
            yield pd.DataFrame({id_col: ids, vec_col: list(block)})

    rng = spark.range(n, numPartitions=max(1, n // rows_per_task))
    return rng.mapInPandas(kernel, schema=f"{id_col} long, {vec_col} array<float>")


def convert_npy_to_parquet(
    spark: SparkSession, src: str, dst: str, limit: int | None = None
) -> None:
    read_npy_vectors(spark, src, limit).write.mode("overwrite").parquet(dst)
