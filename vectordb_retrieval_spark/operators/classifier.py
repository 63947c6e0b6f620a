"""Weak-label quality classifier: multinomial Naive Bayes over tokens.

The CCNet/fastText pattern — train a cheap linear text classifier on
heuristic (weak) quality labels, then score the whole corpus with it —
re-expressed so training is EXACT integer counting (no iterative
optimizer): multinomial NB with Laplace smoothing.  That choice is
deliberate for this engine: the learned weights are closed-form
functions of token counts, so the entire train+score pipeline is
reproducible by a SQL oracle, unlike SGD/LBFGS classifiers whose
coefficients depend on float reduction order.

Pipeline (all built-ins, one token explode evaluated for counts and
tf):
1. weak labels from the shared quality rules (textops.quality_rules);
2. per-token class counts -> smoothed log-likelihood-ratio weights
   w(t) = ln((c1+a)/(N1+aV)) - ln((c0+a)/(N0+aV)), prior ln(n1/n0);
3. score(doc) = prior + sum_t tf(doc,t) * w(t)  (one tf groupBy + one
   weight join + one per-doc sum).

Scale shape: two map-side-combined shuffles (token counts, per-doc tf)
plus a weights equi-join; the totals are one 3-number aggregate
broadcast back.  No driver-side loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import tokens_expr
from vectordb_retrieval_spark.operators.textops import quality_rules


def nb_quality_classifier(
    df: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    **quality_kwargs,
) -> DataFrame:
    """(doc_id, label, score, pred): weak label, NB log-odds score and
    the classifier's verdict (score > 0) for every document.

    Raises if the weak labeling is degenerate (single class) — a
    classifier trained on one class is a constant."""
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(F.col(text_col)).alias("toks")
    )
    rules = quality_rules(F.col("toks"), **quality_kwargs)
    keep = (
        rules["r_len"] & rules["r_mean"] & rules["r_stop"] & rules["r_rep"]
    )
    # eager localCheckpoint, not .cache(): the labeled frame feeds three
    # consumers (counts, class sizes, the output join) and returning a
    # cached frame would leak a CacheManager entry per call — the same
    # fix global_rank carries (text_retrieval.py)
    lab = base.select(
        "doc_id", "toks", keep.cast("int").alias("label")
    ).localCheckpoint(eager=True)

    tok = lab.select("doc_id", "label", F.explode("toks").alias("term"))
    tc = tok.groupBy("term").agg(
        F.sum(F.col("label")).alias("c1"),
        F.sum(1 - F.col("label")).alias("c0"),
    )
    tot = tc.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0"), F.count("*").alias("v")
    ).first()
    n1, n0, v = int(tot["n1"] or 0), int(tot["n0"] or 0), int(tot["v"])
    docs_by_class = {
        int(r["label"]): int(r["n"])
        for r in lab.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    if docs_by_class.get(1, 0) == 0 or docs_by_class.get(0, 0) == 0:
        raise ValueError(
            "nb_quality_classifier: weak labeling is single-class "
            f"({docs_by_class}); adjust the quality thresholds"
        )
    import math

    prior = math.log(docs_by_class[1] / docs_by_class[0])

    w = tc.select(
        "term",
        (
            F.log((F.col("c1") + F.lit(alpha)) / F.lit(n1 + alpha * v))
            - F.log((F.col("c0") + F.lit(alpha)) / F.lit(n0 + alpha * v))
        ).alias("w"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    sc = (
        tf.join(w, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("s"))
    )
    out = (
        lab.select("doc_id", "label")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("label").cast("long").alias("label"),
            F.round(F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(prior), 6).alias(
                "score"
            ),
            (
                (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(prior)) > 0
            ).cast("long").alias("pred"),
        )
    )
    return out


def roc_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    round_digits: int = 6,
) -> DataFrame:
    """(score, tp, fp, fn, tn) per distinct score threshold, ordered by
    score descending — the full ROC/PR operating curve of a scored,
    binary-labeled frame (predict positive when score >= threshold).
    AUC, precision/recall/F1 at any threshold all derive from it.

    Scores are rounded to ``round_digits`` BEFORE grouping so threshold
    groups are engine-independent (raw log-odds sums differ across
    engines at ULP level and would split tie groups differently).

    Scale note: the cumulative sums run in one global window over the
    DISTINCT-score table — curve cardinality, not corpus cardinality.
    For corpora where even distinct thresholds are huge, coarsen
    ``round_digits`` (the curve itself is the requested output)."""
    from pyspark.sql import Window

    s = scored.select(
        F.round(F.col(score_col), round_digits).alias("score"),
        F.col(label_col).cast("long").alias("label"),
    )
    g = s.groupBy("score").agg(
        F.sum("label").alias("pos"),
        F.sum(F.lit(1) - F.col("label")).alias("neg"),
    )
    tot = s.agg(
        F.sum("label").alias("n_pos"),
        F.sum(F.lit(1) - F.col("label")).alias("n_neg"),
    )
    w = Window.orderBy(F.col("score").desc())
    return (
        g.select(
            "score",
            F.sum("pos").over(w).alias("tp"),
            F.sum("neg").over(w).alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "score",
            "tp",
            "fp",
            (F.col("n_pos") - F.col("tp")).alias("fn"),
            (F.col("n_neg") - F.col("fp")).alias("tn"),
        )
    )
