"""Retrieve-then-rerank: second-stage scoring of a candidate list.

The standard two-stage serving stack (BM25/ANN recall → precise
re-scoring of the short list).  Two scorers:

- ``jaccard_rerank`` — exact token-set Jaccard between query terms and
  the candidate document, pure column expressions (one broadcast-sized
  join of candidates onto the doc table, no scan of non-candidates),
  fully reproducible by a SQL oracle.  This is both a usable lexical
  reranker and the deterministic stand-in for the model path.
- ``cross_encoder_rerank`` — batched (query, doc) pair scoring through
  a sentence-transformers CrossEncoder inside ``mapInPandas``
  (model-per-task, Arrow batches).  Raises NotImplementedError when
  the library is absent (same env-gate convention as
  sources/embedder.py); the Spark-side plumbing — pair join, batch
  shape, output contract — is identical for any scorer.

Scale shape: candidates are k·n_queries rows (tiny next to the
corpus); the doc-text join is a broadcast of the candidate ids onto
the documents scan, so the corpus is read once and filtered down to
candidates before any scoring.  Rerank windows partition by qid.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import tokens_expr


def _candidate_texts(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(qid, doc_id, text): candidate rows with their document text —
    a left-semi-shaped broadcast join that never widens the corpus."""
    cand = candidates.select("qid", "doc_id")
    return cand.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        "doc_id",
    )


def jaccard_rerank(
    candidates: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    terms_col: str = "terms",
) -> DataFrame:
    """Re-rank (qid, doc_id) candidates by token-set Jaccard between
    the query's term set and the document's token set.

    Returns (qid, doc_id, score, rank) with rank 1..top_k per query by
    (score desc, doc_id) — same tie-break contract as bm25_search.
    """
    withtext = _candidate_texts(candidates, docs, id_col, text_col)
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.array_distinct(F.col(terms_col)).alias("qset"),
    )
    scored = (
        withtext.join(q, "qid")
        .withColumn("dset", F.array_distinct(tokens_expr(F.col("text"))))
        .withColumn(
            "score",
            F.size(F.array_intersect("qset", "dset"))
            / F.greatest(F.size(F.array_union("qset", "dset")), F.lit(1)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "doc_id", "score", "rank")
    )


def cross_encoder_rerank(
    candidates: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    model_name: str = "overlap-stub",
    batch_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Model-scored rerank of (query_text, doc_text) pairs.

    ``model_name="overlap-stub"`` → a deterministic no-dependency
    scorer (token-overlap count — NOT the Jaccard of
    :func:`jaccard_rerank`, so the two paths are distinguishable in
    tests); any other name → sentence-transformers CrossEncoder,
    NotImplementedError when absent.
    """
    import numpy as np
    import pandas as pd

    pairs = _candidate_texts(candidates, docs, id_col, text_col).join(
        queries.select(
            F.col(qid_col).alias("qid"), F.col(qtext_col).alias("qtext")
        ),
        "qid",
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        scorer: Callable[[list], "np.ndarray"]
        if model_name == "overlap-stub":

            def scorer(pair_list):
                return np.asarray(
                    [
                        float(len(set(q.lower().split()) & set(d.lower().split())))
                        for q, d in pair_list
                    ]
                )

        else:
            try:
                from sentence_transformers import CrossEncoder
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "sentence-transformers is not installed in this "
                    "environment; use model_name='overlap-stub' for the "
                    "deterministic fallback"
                ) from e
            model = CrossEncoder(model_name)
            scorer = lambda pair_list: np.asarray(  # noqa: E731
                model.predict(pair_list, batch_size=batch_size)
            )

        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                s = scorer(
                    list(zip([str(t) for t in chunk["qtext"]],
                             [str(t) for t in chunk["text"]]))
                )
                yield pd.DataFrame(
                    {
                        "qid": chunk["qid"].to_numpy(dtype=np.int64),
                        "doc_id": chunk["doc_id"].to_numpy(dtype=np.int64),
                        "score": s.astype(np.float64),
                    }
                )

    scored = pairs.mapInPandas(kernel, schema="qid long, doc_id long, score double")
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "doc_id", "score", "rank")
    )


def mmr_rerank(
    cand: DataFrame,
    k: int,
    lambda_: float = 0.5,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
) -> DataFrame:
    """Maximal Marginal Relevance diversified selection (Carbonell &
    Goldstein 1998): greedily pick, per query, the candidate maximizing
    ``lambda * rel - (1 - lambda) * max_sim_to_already_picked`` until
    ``k`` are chosen; ties break to the lower id.  Similarity is the
    dot product of the candidate vectors (normalize upstream for
    cosine).  The classic redundancy-killer between retrieval and
    consumption — composes after any candidate generator
    (``bm25_topk``, ANN search, ``jaccard_rerank``).

    Scale shape: MMR only ever touches each query's SHORT candidate
    list (the same contract as the other rerankers here), so the greedy
    O(k * C) loop runs inside one applyInPandas over qid — one shuffle
    of candidate rows, no driver loop.  With integer-valued vectors and
    lambda = 0.5 every score is exactly representable, so an external
    engine's greedy (recursive SQL) reproduces the selection
    bit-for-bit — the driver query's oracle does exactly that.
    """
    import numpy as np
    import pandas as pd

    lam = float(lambda_)

    def per_q(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy().astype(np.float64)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        picked: list[int] = []
        used = np.zeros(n, dtype=bool)
        maxsim = None  # true max over picked — may be negative, so no
        # zero-clamp: it starts only after the first pick
        while len(picked) < min(k, n):
            if maxsim is None:
                score = lam * rel
            else:
                score = lam * rel - (1.0 - lam) * maxsim
            score[used] = -np.inf
            # argmax with lower-id tie-break: ids ascending by sort, so
            # the FIRST max position is the lowest id
            j = int(np.argmax(score))
            picked.append(j)
            used[j] = True
            # one matvec per pick (O(k*C*d) total) — the full C x C
            # Gram matrix would compute C-k columns never read
            sims_j = x @ x[j]
            if maxsim is None:
                maxsim = sims_j
            else:
                np.maximum(maxsim, sims_j, out=maxsim)
        return pd.DataFrame(
            {
                "qid": pdf[qid_col].iloc[:1].repeat(len(picked)).to_numpy(),
                "doc_id": ids[picked],
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return (
        cand.select(qid_col, id_col, rel_col, vec_col)
        .groupBy(qid_col)
        .applyInPandas(per_q, schema="qid long, doc_id long, mmr_rank int")
    )
