"""fvecs/ivecs binary vector readers (SIFT1M layout).

Reference counterpart: ``_read_fvecs``/``_read_ivecs``
(dataset.py:522-574): each record is ``[dim: int32][dim × payload]``
with payload float32 (fvecs) or int32 (ivecs).

Spark-first design: files load through the ``binaryFile`` source and
decode in an Arrow-batched kernel, one file per task — the natural unit
because record ids are positional within a file.  Row ids are
``file_offset + position`` where per-file offsets come from a one-pass
file-size listing (records per file = bytes / record_size), so a
directory of shards decodes in parallel with globally consistent ids.
For repeated consumption the right move at scale is a one-time convert
to Parquet (``convert_vecs_to_parquet``); the reader is the ingestion
edge, not the steady state.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _decode(content: bytes, dtype: str) -> np.ndarray:
    """Decode one .fvecs/.ivecs payload to an (n, dim) array."""
    raw = np.frombuffer(content, dtype=np.int32)
    if raw.size == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(raw[0])
    if dim <= 0 or raw.size % (dim + 1) != 0:
        raise ValueError(f"corrupt vecs file: dim={dim}, words={raw.size}")
    mat = raw.reshape(-1, dim + 1)[:, 1:]
    dims = raw.reshape(-1, dim + 1)[:, 0]
    if not (dims == dim).all():
        raise ValueError("corrupt vecs file: inconsistent per-record dims")
    return mat.view(np.float32) if dtype == "float32" else mat


def read_vecs(
    spark: SparkSession,
    path: str,
    kind: str = "fvecs",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, vec) rows from .fvecs (float32) or .ivecs (int32) files.

    ``path`` may be a file or a glob/directory of shards; ids are
    assigned positionally per file, offset by the cumulative record
    counts of lexicographically earlier files.
    """
    if kind not in ("fvecs", "ivecs"):
        raise ValueError(f"kind must be fvecs|ivecs, got {kind!r}")
    dtype = "float32" if kind == "fvecs" else "int32"
    spark_type = "array<float>" if kind == "fvecs" else "array<int>"

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "length")
        .orderBy("path")
        .collect()
    )
    # per-file id offsets from record counts; the record size needs dim,
    # probed once by reading 4 bytes of the first file on the driver
    # (all shards share one layout)
    offsets: dict[str, int] = {}
    if files:
        first = files[0].path.removeprefix("file:")
        with open(first, "rb") as fh:
            dim = int(np.frombuffer(fh.read(4), dtype=np.int32)[0])
        rec_bytes = 4 * (dim + 1)
        running = 0
        for r in files:
            offsets[r.path] = running
            if r.length % rec_bytes != 0:
                raise ValueError(f"{r.path}: size {r.length} not a multiple of record size {rec_bytes}")
            running += r.length // rec_bytes
    bc = spark.sparkContext.broadcast(offsets)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs = bc.value
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                mat = _decode(bytes(content), dtype)
                base = offs[path]
                yield pd.DataFrame(
                    {
                        id_col: np.arange(base, base + mat.shape[0], dtype=np.int64),
                        vec_col: list(mat),
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(kernel, schema=f"{id_col} long, {vec_col} {spark_type}")
    )


def write_vecs(
    df: DataFrame,
    path: str,
    kind: str = "fvecs",
    id_col: str = "id",
    vec_col: str = "vec",
    num_shards: int = 4,
) -> None:
    """Distributed .fvecs/.ivecs export — the inverse of ``read_vecs``.

    Rows are range-partitioned on ``id_col`` and each partition writes
    one shard file named by its partition index, so the lexicographic
    file order ``read_vecs`` relies on reproduces the global id order:
    reading the export back yields positional ids equal to each row's
    rank by ``id_col``.  Executors write to a shared filesystem under
    ``path`` (the same contract as a Parquet ``path``) with a
    task-commit protocol: each task writes a temp name salted by its
    attempt number and ``os.replace``s it into place at task end, so a
    speculative or zombie retry can never interleave bytes with the
    winning attempt — last rename wins atomically with complete
    content.  Record layout matches the reference
    (``dataset.py:522-574``): ``[dim: int32][dim × payload]``.
    """
    import os

    if kind not in ("fvecs", "ivecs"):
        raise ValueError(f"kind must be fvecs|ivecs, got {kind!r}")
    payload_dtype = np.float32 if kind == "fvecs" else np.int32
    os.makedirs(path, exist_ok=True)

    part = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .repartitionByRange(num_shards, "id")
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        fh = None
        tmp = final = None
        written = 0
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if fh is None:
                    pid = int(pdf["pid"].iloc[0])
                    ctx = TaskContext.get()
                    attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
                    final = os.path.join(path, f"shard-{pid:05d}.{kind}")
                    tmp = os.path.join(
                        path, f".shard-{pid:05d}.{kind}.tmp-{attempt}"
                    )
                    fh = open(tmp, "wb")
                mat = np.asarray(
                    [np.asarray(v, dtype=payload_dtype) for v in pdf["vec"]]
                )
                out = np.empty((mat.shape[0], mat.shape[1] + 1), dtype=np.int32)
                out[:, 0] = mat.shape[1]
                out.view(payload_dtype)[:, 1:] = mat
                out.tofile(fh)
                written += len(pdf)
        except BaseException:
            if fh is not None:
                fh.close()
                fh = None
                if tmp is not None:
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
            raise
        if fh is not None:
            fh.close()
            os.replace(tmp, final)
        yield pd.DataFrame({"n": [written]})

    # one count row per partition forces full evaluation of the write
    part.mapInPandas(kernel, schema="n long").collect()


def convert_vecs_to_parquet(
    spark: SparkSession, src: str, dst: str, kind: str = "fvecs"
) -> None:
    """One-time ingestion: .fvecs/.ivecs → Parquet (the steady-state
    format; every downstream operator reads Parquet)."""
    read_vecs(spark, src, kind).write.mode("overwrite").parquet(dst)


def ivecs_ground_truth(gt_df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """Reshape an ivecs table (qid-positional rows of neighbor ids) into
    the engine's exploded GT contract DataFrame(qid, id, rank)."""
    return (
        gt_df.select(
            F.col(id_col).alias("qid"),
            F.posexplode(F.col(vec_col)).alias("pos", "nid"),
        )
        .select("qid", F.col("nid").cast("long").alias("id"), (F.col("pos") + 1).alias("rank"))
    )
