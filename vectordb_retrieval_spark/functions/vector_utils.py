"""Vector utilities (reference: src/utils/vector_utils.py:53-82).

``random_unit_vectors`` — seeded unit-norm vectors, distributed and
partition-independent (Philox row streams like sources.random_gen).
``format_vector_col`` — vector → display string column, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def random_unit_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """n seeded random unit-norm vectors (reference:
    vector_utils.py:53-69 gaussian-then-normalize)."""
    from vectordb_retrieval_spark.sources.random_gen import random_vectors

    df = random_vectors(spark, n, dim, seed, id_col=id_col, vec_col=vec_col)
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return df.withColumn(
        vec_col, F.transform(v, lambda x: (x.cast("double") / safe).cast("float"))
    )


def format_vector_col(
    vec: Column, precision: int = 4, max_elems: int = 6
) -> Column:
    """Pretty-print an array column: "[0.1234, …, 0.5678] (dim=64)"
    (reference: vector_utils.py:71-82 head/tail elision)."""
    shown = F.transform(
        F.slice(vec, 1, max_elems), lambda x: F.format_number(x.cast("double"), precision)
    )
    body = F.concat_ws(", ", shown)
    ell = F.when(F.size(vec) > max_elems, F.lit(", …")).otherwise(F.lit(""))
    return F.concat(
        F.lit("["), body, ell, F.lit("] (dim="),
        F.size(vec).cast("string"), F.lit(")"),
    )
