"""Deterministic sampling and quantile gating for training-data curation.

The reference's only sampling surface is the seeded MS MARCO subsampler
(``src/dataprep/embed_msmarco.py``'s numpy RNG choice); a corpus
pipeline needs reproducible DISTRIBUTED sampling: the keep/drop decision
for a row must depend only on (row id, seed) so that re-runs, retries
and incremental reprocessing agree without any coordination.  Every
operator below is a pure column expression or a shard-partitioned
window — nothing funnels through one task.

Hash: Knuth multiplicative on the id pre-reduced mod 1e6+3, so the
product stays far inside int64 for ANSI engines (the DuckDB oracle
errors on bigint overflow rather than wrapping)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2_654_435_761
_MOD = 1_000_000_007
_PREMOD = 1_000_003


def sample_hash(col: Column, seed: int = 0) -> Column:
    """Deterministic per-id hash in [0, 1e9+7) — the shared coin for
    every sampler here (and their DuckDB oracle twins)."""
    return (
        (F.pmod(col, F.lit(_PREMOD)) + F.lit(seed)) * F.lit(_KNUTH)
    ) % F.lit(_MOD)


def hash_sample(
    df: DataFrame, rate: float, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Bernoulli-style sample at ``rate`` keyed on the id hash: a row is
    kept iff hash < rate·MOD.  Unlike ``df.sample`` the decision is a
    pure function of (id, seed) — stable across retries, partitionings
    and engines."""
    return df.filter(sample_hash(F.col(id_col), seed) < int(rate * _MOD))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. upsample low-resource
    languages): keep iff id-hash < rate(stratum)·MOD.  One scan, no
    shuffle — the rate table is a CASE expression, not a join."""
    rate = F.lit(int(default_rate * _MOD))
    for key, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col) == key, F.lit(int(r * _MOD))
        ).otherwise(rate)
    return df.filter(sample_hash(F.col(id_col), seed) < rate)


def take_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash
    order — the deterministic equivalent of per-group reservoir
    sampling.  The window is PARTITIONED BY the stratum, so each
    stratum's top-n is an independent partial sort (WindowGroupLimit
    pushes the limit below the exchange)."""
    h = sample_hash(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def mixture_rates(
    df: DataFrame,
    source_col: str,
    targets: dict[str, float],
    weight_col: str | None = None,
    budget: float | None = None,
) -> dict[str, float]:
    """Plan a data mixture: per-source Bernoulli rates that realize the
    ``targets`` proportions (by ``weight_col`` mass — e.g. token counts
    — or by document count when None), scaled as large as the AVAILABLE
    data allows: the binding source samples at rate 1.0 and everything
    else downsamples around it.  ``budget`` caps the total sampled mass.

    One groupBy aggregate (sources are few); the returned dict feeds
    ``stratified_sample`` — so the plan is driver-side arithmetic and
    the sampling itself stays a pure column expression."""
    total_t = sum(targets.values())
    if total_t <= 0:
        raise ValueError("mixture targets must sum to a positive value")
    shares = {k: v / total_t for k, v in targets.items()}
    w = F.col(weight_col) if weight_col else F.lit(1)
    avail = {
        r["src"]: float(r["mass"])
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.sum(w).alias("mass"))
        .collect()
    }
    missing = [k for k, s in shares.items() if s > 0 and not avail.get(k)]
    if missing:
        raise ValueError(f"no rows for mixture sources: {missing}")
    scale = min(avail[k] / s for k, s in shares.items() if s > 0)
    if budget is not None:
        scale = min(scale, budget)
    return {
        k: min(1.0, (shares[k] * scale) / avail[k]) if shares[k] > 0 else 0.0
        for k in shares
    }


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Curriculum bucketing: a ``bucket`` column (0..n_buckets−1) holding
    the row's corpus-quantile band of ``score_col`` — the standard
    length/quality curriculum layout for LLM training (feed bucket 0
    first, bucket n−1 last).

    bucket = how many of the (n_buckets−1) interior quantile thresholds
    the score meets (score == threshold rounds UP into the higher
    band).  One threshold aggregate broadcast back, then a per-row
    array count — no shuffle of the corpus.  Unlike an ``ntile``
    window this never funnels rows through a global sort: at 100 TB
    set ``exact=False`` for the sketch-based thresholds."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    arr = ", ".join(repr(q) for q in qs)
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    thr = df.agg(
        F.expr(f"{fn}({score_col}, array({arr}){acc})").alias("_thr")
    )
    return (
        df.join(F.broadcast(thr))
        .withColumn(
            "bucket",
            F.size(
                F.filter(F.col("_thr"), lambda t: F.col(score_col) >= t)
            ).cast("int"),
        )
        .drop("_thr")
    )


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic disjoint-and-complete dataset split (train/val/
    test...): the id hash falls into consecutive ranges sized by
    ``weights`` (normalized), and the row gets that range's label in a
    new ``split`` column.  A pure column expression — no shuffle, no
    sampling state, stable under retries and incremental reprocessing;
    rows route identically whether the corpus is processed whole or in
    batches.  Ranges follow the sorted label order so the split is a
    function of (weights, seed) alone."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    h = sample_hash(F.col(id_col), seed)
    acc = 0.0
    expr = None
    labels = sorted(weights)
    for name in labels[:-1]:
        acc += weights[name] / total
        bound = int(acc * _MOD)
        cond = h < bound
        expr = (
            F.when(cond, name)
            if expr is None
            else expr.when(cond, name)
        )
    last = F.lit(labels[-1])
    expr = last if expr is None else expr.otherwise(labels[-1])
    return df.withColumn("split", expr)


def quantile_gate(
    df: DataFrame,
    score_col: str,
    q: float,
    keep: str = "above",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep rows above (or below) the corpus ``q``-quantile of
    ``score_col`` — the relative quality gate ("drop the worst decile")
    that complements textops.quality_filter's absolute thresholds.

    ``exact=True`` computes the interpolated percentile (one full-column
    aggregate — fine to ~1e9 rows, and what the DuckDB quantile_cont
    oracle matches bit-for-bit).  At 100 TB set ``exact=False``:
    ``approx_percentile`` (t-digest-style sketch, partial-aggregable,
    one scalar out) with ``accuracy`` as the error knob."""
    fn = (
        F.expr(f"percentile({score_col}, {q!r})")
        if exact
        else F.expr(f"approx_percentile({score_col}, {q!r}, {accuracy})")
    )
    thresh = df.agg(fn.alias("_thresh"))
    cond = (
        F.col(score_col) >= F.col("_thresh")
        if keep == "above"
        else F.col(score_col) < F.col("_thresh")
    )
    return df.join(F.broadcast(thresh)).filter(cond).drop("_thresh")
