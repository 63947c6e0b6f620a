"""Batched text embedding via ``mapInPandas``.

Reference counterpart: ``dataprep/embed_msmarco.py:116-201`` — a
SentenceTransformer (all-MiniLM-L6-v2, 384-d) encoding TSV corpora to
``.npy``.  This is the BASELINE.json north star: "batch embedding
generation with DataFrame".

Spark-first: one model per executor task (loaded lazily inside the
kernel, reused across Arrow batches), text in → ``array<float>`` out,
so throughput scales linearly with executors and no embedding matrix
ever lands on the driver.  The model library is not installed in this
container, so ``model_name="hash-stub"`` provides a deterministic
fallback (token-hash bag projection, unit-normalized) that exercises
the identical plumbing; any sentence-transformers model name works
when the library is present.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _hash_stub_encoder(
    dim: int, normalize: bool = True
) -> Callable[[list[str]], np.ndarray]:
    """Deterministic stand-in encoder: each whitespace token adds a
    signed unit basis vector chosen by md5(token); rows unit-normalize
    (``normalize=False`` keeps the exact integer sign-sums, which an
    external SQL engine reproduces without float rounding).
    Near-duplicate texts map to nearby vectors, so downstream ANN/dedup
    behave qualitatively like a real embedding space."""

    def encode(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for r, text in enumerate(texts):
            for tok in text.lower().split():
                h = hashlib.md5(tok.encode()).digest()
                idx = int.from_bytes(h[:4], "big") % dim
                sign = 1.0 if h[4] & 1 else -1.0
                out[r, idx] += sign
            if normalize:
                n = float(np.linalg.norm(out[r]))
                if n > 0:
                    out[r] /= n
        return out

    return encode


def embed_text(
    df: DataFrame,
    model_name: str = "hash-stub",
    dim: int = 384,
    batch_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(id, embedding): batched model inference over a text column.

    ``model_name="hash-stub"`` → deterministic no-dependency encoder;
    any other name → sentence-transformers (raises NotImplementedError
    when the library is absent, marking the real integration point).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if model_name == "hash-stub":
            encode = _hash_stub_encoder(dim, normalize)
        else:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "sentence-transformers is not installed in this "
                    "environment; use model_name='hash-stub' for the "
                    "deterministic fallback"
                ) from e
            model = SentenceTransformer(model_name)
            encode = lambda ts: model.encode(  # noqa: E731
                ts, batch_size=batch_size, convert_to_numpy=True
            ).astype(np.float32)

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                mat = encode([str(t) for t in chunk[text_col]])
                yield pd.DataFrame(
                    {
                        "id": chunk[id_col].to_numpy(dtype=np.int64),
                        vec_col: list(mat),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"id long, {vec_col} array<float>"
    )


def subsample(
    df: DataFrame, n: int, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Seeded deterministic subsample of n rows (reference:
    dataprep/subsample_msmarco.py:62-164 reservoir sampling) — smallest
    n values of a seeded per-row md5, stable under any partitioning and
    reproducible outside Spark (md5 over "id:seed" is engine-agnostic).
    ORDER BY hash LIMIT n compiles to TakeOrderedAndProject: each task
    keeps a size-n heap, the driver merges — no full sort at scale."""
    from pyspark.sql import functions as F

    key = F.md5(
        F.encode(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))),
            "UTF-8",
        )
    )
    return (
        df.withColumn("_r", key)
        .orderBy("_r", id_col)
        .limit(n)
        .drop("_r")
    )
