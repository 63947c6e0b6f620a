"""GloVe whitespace-text reader + seeded train/test split.

Reference counterpart: ``_process_glove`` (dataset.py:611-663) — parse
``glove.6B.50d.txt`` (word then d floats per line), take a seeded random
test subset, optional train/test limits, brute-force ground truth.

Spark-first: ``spark.read.text`` + column-expression split/cast (pure
JVM), a deterministic hash-ordered split instead of a driver-side
shuffle (same "seeded random subset" semantics, but reproducible on any
cluster and any partitioning), and ground truth from the exact-kNN
operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.exact import ground_truth


def read_glove(
    spark: SparkSession, path: str, id_col: str = "id", vec_col: str = "vec"
) -> DataFrame:
    """(id, word, vec) from a GloVe text file.  Ids are the hash-ordered
    rank of the word (deterministic, partition-independent); the word
    column is kept as per-vector metadata."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.split(F.trim(F.col("value")), r"\s+").alias("parts")
    ).select(
        F.element_at("parts", 1).alias("word"),
        F.transform(F.slice("parts", 2, 100_000), lambda x: x.cast("float")).alias(
            vec_col
        ),
    )
    from vectordb_retrieval_spark.operators.text_retrieval import global_rank

    # distributed rank assignment (range sort + per-partition offsets),
    # not an unpartitioned row_number window
    ranked = global_rank(parsed, [F.xxhash64("word"), F.col("word")])
    return ranked.select(
        (F.col("rank") - 1).cast("long").alias(id_col), "word", vec_col
    )


def glove_dataset(
    spark: SparkSession,
    path: str,
    test_size: int = 256,
    train_limit: int | None = None,
    ground_truth_k: int = 200,
    seed: int = 11,
    metric: str = "l2",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, gt): seeded split of a GloVe file.  Test rows are
    the ``test_size`` smallest values of a seeded per-row hash — the
    same "random subset without replacement" semantics as the
    reference's RandomState.choice (dataset.py:636-643), expressed as a
    deterministic order so any executor layout reproduces it."""
    vocab = read_glove(spark, path).withColumn(
        "_r", F.xxhash64(F.col("word"), F.lit(seed))
    )
    test = (
        vocab.orderBy("_r", "id")
        .limit(test_size)
        .select(F.col("id").alias("qid"), F.col("vec"))
    )
    train = vocab.join(
        test.select(F.col("qid").alias("id")), "id", "left_anti"
    ).select("id", "vec")
    if train_limit:
        train = train.orderBy("_r", "id").limit(train_limit).select("id", "vec")
    gt = ground_truth(train, test, ground_truth_k, metric, qid_col="qid", qvec_col="vec")
    return train, test, gt


def write_glove(
    df: DataFrame, path: str, word_col: str = "word", vec_col: str = "vec"
) -> None:
    """Distributed GloVe-text export (inverse of ``read_glove``): one
    ``word v1 … vd`` line per row, written through Spark's native text
    sink.  Floats are formatted with Python shortest-repr of the
    float32 value, which ``read_glove``'s string→float cast recovers
    bit-exactly (the decimal equals the float32 value, so
    nearest-float parse returns the original)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fmt(words: pd.Series, vecs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                f"{w} " + " ".join(repr(float(x)) for x in v)
                for w, v in zip(words, vecs)
            ]
        )

    df.select(
        fmt(F.col(word_col), F.col(vec_col)).alias("value")
    ).write.mode("overwrite").text(path)
