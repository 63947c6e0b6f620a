"""Text-analysis operators for training-data pipelines: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure built-in column expressions (JVM/codegen, no UDFs) — each maps
1:1 to an oracle SQL in driver_queries.textq.  Scale: embarrassingly
parallel per-row transforms; the only shuffle is an optional final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.dedup import (
    canonical_text,
    tokens_expr,
    word_shingles,
)

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "en", "pour", "que"],
}


def text_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features: token count, char count, mean token
    length, stopword ratio (en list), punctuation count."""
    toks = tokens_expr(F.col(text_col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(tok_chars / F.size(toks), 6).alias("mean_token_len"),
        F.round(n_stop / F.size(toks), 6).alias("stopword_ratio"),
        F.size(F.split(F.col(text_col), r"[.,;:!?]")).alias("n_punct_splits"),
    )


def lang_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-vote language heuristic: the language whose stopword list
    matches the most token occurrences wins; ties break alphabetically;
    zero matches → 'und' (undetermined)."""
    toks = tokens_expr(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        lw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(lw, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    # max over (n, reversed-lang) implements: highest n, ties → lowest lang
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["n"].alias("n"),
                    # invert lang ordering so array_max prefers the
                    # alphabetically-smallest language on score ties
                    F.lit(len(scores) - i).alias("inv"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (word / number / single-punctuation pieces)."""
    toks = tokens_expr(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens_ws"),
        F.regexp_count(F.col(text_col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).alias(
            "n_tokens_re"
        ),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features: fraction of tokens taken by the
    most frequent token / 2-gram, and the distinct-token ratio.  High
    top-fraction or low distinct-ratio marks boilerplate or degenerate
    repetition (ref analogue: the quality gates around dataset.py's
    passage selection; rule values follow Rae et al. 2021 table A1).

    Pure column expressions; the per-doc mode is O(distinct × n) inside
    one row — no shuffle, no UDF.
    """
    toks = tokens_expr(F.col(text_col))

    def top_frac(arr):
        top = F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda w: F.size(F.filter(arr, lambda x: x == w)),
            )
        )
        return F.round(top / F.size(arr), 6)

    grams2 = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"),
        top_frac(toks).alias("top_word_frac"),
        F.when(F.size(grams2) > 0, top_frac(grams2)).alias("top_2gram_frac"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "distinct_ratio"
        ),
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 400,
    min_mean_len: int = 2,
    max_mean_len: int = 12,
    top_word_den: int = 5,
) -> DataFrame:
    """C4/Gopher-style keep/drop rule set over the per-doc features:
    token-count window, mean-token-length window, ≥1 English stopword,
    most-frequent-token fraction ≤ 1/top_word_den.  Thresholds compare
    in integer arithmetic (e.g. top*den ≤ n, sum ≥ min_mean*n) so the
    oracle comparison is exact — no float rounding at the decision
    boundary.  Returns one 0/1 column per rule plus the conjunction.
    """
    r = quality_rules(
        tokens_expr(F.col(text_col)),
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_mean_len=min_mean_len,
        max_mean_len=max_mean_len,
        top_word_den=top_word_den,
    )
    return df.select(
        F.col(id_col).alias("id"),
        r["r_len"].cast("int").alias("r_len"),
        r["r_mean"].cast("int").alias("r_mean_len"),
        r["r_stop"].cast("int").alias("r_stopword"),
        r["r_rep"].cast("int").alias("r_repetition"),
        (r["r_len"] & r["r_mean"] & r["r_stop"] & r["r_rep"])
        .cast("int")
        .alias("keep"),
    )


def quality_rules(
    toks,
    min_tokens: int = 20,
    max_tokens: int = 400,
    min_mean_len: int = 2,
    max_mean_len: int = 12,
    top_word_den: int = 5,
) -> dict:
    """The rule columns from ONE token-array expression — shared by
    quality_filter and the composed curation pipeline so the
    tokenization is evaluated once per row regardless of how many
    consumers need it.  Keys: n_tokens, r_len, r_mean, r_stop, r_rep."""
    n = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    return {
        "n_tokens": n,
        "r_len": (n >= min_tokens) & (n <= max_tokens),
        "r_mean": (tok_chars >= min_mean_len * n)
        & (tok_chars <= max_mean_len * n),
        "r_stop": F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        > 0,
        "r_rep": top * top_word_den <= n,
    }


def decontam_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
    bench_mod: int = 50,
    max_bench_gram_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs whose n-gram
    shingles overlap a held-out benchmark set (docs with
    id % bench_mod == 0).  Shingles are distinct per doc, so the join
    count IS the number of distinct shared n-grams.

    Scale shape: the benchmark side is the small dimension — broadcast
    it, stream the training-side gram explode past it with no shuffle
    of the big side; the only aggregation is the per-pair count
    (verified BroadcastHashJoin/BuildRight with pruned ReadSchema on
    the plan).  At 100 TB the bench set (an eval suite) stays
    broadcast-sized.  `max_bench_gram_df` drops grams present in more
    than that many bench docs before the join — stop-phrase grams
    otherwise multiply join output by their bench-side frequency; the
    cap is computed on the already-small bench side, so it costs one
    tiny aggregate and keeps the fan-out per training gram bounded.
    """
    sh = word_shingles(F.col(text_col), n)
    ex = df.select(F.col(id_col).alias("id"), F.explode(sh).alias("sh"))
    bench = ex.where(F.col("id") % bench_mod == 0).select(
        F.col("id").alias("bench_id"), "sh"
    )
    if max_bench_gram_df is not None:
        # shingles are distinct per doc, so count(*) per gram = its
        # bench document frequency
        keep = (
            bench.groupBy("sh")
            .agg(F.count("*").alias("gram_df"))
            .where(F.col("gram_df") <= max_bench_gram_df)
            .select("sh")
        )
        bench = bench.join(keep, "sh")
    train = ex.where(F.col("id") % bench_mod != 0).select(
        F.col("id").alias("train_id"), "sh"
    )
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .orderBy("train_id", "bench_id")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Language-model quality score in the CCNet spirit: each doc's
    mean log10 token probability under the CORPUS's own Laplace-smoothed
    unigram distribution — documents full of rare/garbage tokens score
    low, fluent in-distribution text scores high.  Output
    (doc_id, n_tokens, logprob) with logprob rounded to 6.

    Plan shape: one explode feeds both the frequency table (groupBy
    term — vocab-sized) and the scoring join (tokens ⋈ freq on term,
    one shuffle each side), then a per-doc mean.  At 100 TB the freq
    table is still ≪ corpus (vocabulary scaling is sub-linear); broadcast
    it when it fits, bucket both sides by term when it doesn't.  A real
    CCNet filter swaps the self-estimated table for a reference LM's —
    same join, different freq source."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("c"))
    tot = freq.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )
    scored = (
        toks.join(freq, "term")
        .join(F.broadcast(tot))
        .withColumn(
            "lp",
            F.log10(
                (F.col("c") + F.lit(alpha))
                / (F.col("n") + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )


def keyword_extract(
    df: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keywords: the ``top_k`` terms by smoothed TF-IDF
    (tf × ln(1 + N/df), ties by term asc) — (doc_id, term, tfidf, rank).
    The per-doc ranking window is PARTITIONED BY doc_id
    (WindowGroupLimit partial top-k), never a global sort; df counts are
    a vocab-sized aggregate joined back on term.  Complements the
    corpus-level TF-IDF embedding pipeline (sources/tfidf.py, reference
    src/dataprep) with a per-doc analysis surface."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a broadcast one-row frame, not a driver action —
    # the whole operator stays one lazy plan
    nd = df.select(F.col(id_col)).distinct().agg(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(nd))
        .withColumn(
            "tfidf", F.col("tf") * F.log(1.0 + F.col("_n") / F.col("df"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank"
        )
    )


def corpus_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row corpus summary: doc count, total/min/max/mean tokens per
    doc, distinct vocabulary size.  The per-doc features reduce with a
    map-side-combined global aggregate; the vocabulary count is the one
    genuine shuffle (distinct over exploded tokens).  At 100 TB swap
    `countDistinct` for `approx_count_distinct` (HLL, no exact-distinct
    shuffle) — exact here because the oracle compares values.
    """
    toks = tokens_expr(F.col(text_col))
    per_doc = df.select(F.size(toks).alias("n"), toks.alias("toks"))
    agg = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
        F.round(F.avg("n"), 6).alias("mean_tokens"),
    )
    vocab = per_doc.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("vocab_size")
    )
    return agg.crossJoin(vocab)


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content-addressable fingerprint: md5 of canonicalized text, plus
    a 60-bit rolling-window winnow (min shingle hash) for near-dup keys."""
    from vectordb_retrieval_spark.operators.dedup import hash60, word_shingles

    sh = word_shingles(F.col(text_col), 3)
    winnow = F.array_min(F.transform(sh, lambda s: hash60(s)))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(canonical_text(F.col(text_col))).alias("fingerprint"),
        winnow.alias("winnow60"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding-prep layout
    (one row per chunk with in-doc token offsets and the chunk text):
    (doc_id, chunk_id, tok_start, tok_end, n_tokens, chunk_text?).

    Window starts are multiples of ``stride = chunk_tokens − overlap``
    while ``start ≤ max(n − overlap − 1, 0)`` — every token is covered
    and no chunk is fully contained in its predecessor; the tail chunk
    may be shorter.  Pure column expressions (one tokenization behind a
    Generate barrier, a bounded explode of ceil(n/stride) starts per
    doc) — no UDFs, no shuffle; chunk_text is rebuilt from the token
    array, so it is whitespace-normalized."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens_expr(F.col(text_col)))).alias("_toks"),
    ).withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    starts = toked.withColumn(
        "_st",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
                F.lit(stride),
            )
        ),
    )
    end = F.least(F.col("_st") + chunk_tokens, F.col("_n"))
    cols = [
        "doc_id",
        (F.col("_st") / stride).cast("int").alias("chunk_id"),
        F.col("_st").cast("int").alias("tok_start"),
        end.cast("int").alias("tok_end"),
        (end - F.col("_st")).cast("int").alias("n_tokens"),
    ]
    if with_text:
        cols.append(
            F.array_join(
                F.slice(
                    F.col("_toks"),
                    F.col("_st") + 1,
                    end - F.col("_st"),
                ),
                " ",
            ).alias("chunk_text")
        )
    return starts.select(*cols)


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Conditional bigram LM quality score — the next step up from
    ``unigram_logprob`` toward the n-gram-LM perplexity filters CCNet
    popularized: each doc's mean log10 of the corpus-estimated
    add-alpha conditional probability p(w2 | w1) =
    (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V) over its adjacent token
    pairs.  Repetitive or boilerplate text scores HIGH (its bigrams are
    common), garbage scores LOW — combine with ``gram_novelty`` for the
    two-sided gate.  Output (doc_id, n_bigrams, logprob), logprob
    rounded to 6; documents with fewer than 2 tokens emit no row.

    Plan shape: one bigram explode feeds the pair-count table (groupBy
    (w1, w2)), the context table (its groupBy w1 re-aggregate), and the
    scoring join; vocabulary size is a broadcast scalar.  Same 100 TB
    notes as unigram_logprob — frequency tables scale sub-linearly;
    broadcast when they fit, bucket by term when they don't."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1), "
                "(t, i) -> struct(t AS w1, toks[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = df.select(
        F.explode(tokens_expr(F.col(text_col))).alias("t")
    ).agg(F.count_distinct("t").alias("v"))
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log10(
                (F.col("c2") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )


def sentence_bleu(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    n_max: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row smoothed sentence BLEU-``n_max`` between two token-array
    columns (Papineni et al. 2002; Lin-Och add-one smoothing for n>1):
    (id, cand_len, ref_len, clip_1..clip_n, tot_1..tot_n, bleu) with
    integer clipped/total n-gram counts (hash-exact) and the final
    score rounded to 6 digits.

    Spark-first shape: pure per-row column expressions — no explode, no
    shuffle, whole-stage codegen end to end.  The per-row distinct-gram
    × filter scan is O(L²) in document length — the right trade for a
    row-local metric at corpus scale (reference corpora are sentences
    to a few hundred tokens).

    BLEU is 0 when the candidate is empty or shares no unigram with the
    reference (log p1 undefined); brevity penalty
    exp(min(0, 1 - ref_len/cand_len))."""
    base = df.select(
        F.col(id_col).alias(id_col),
        F.col(cand_col).alias("_c"),
        F.col(ref_col).alias("_r"),
    )

    def grams(col: str, n: int) -> str:
        if n == 1:
            return col
        return (
            f"CASE WHEN size({col}) >= {n} THEN "
            f"transform(sequence(1, size({col}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({col}, i, {n}))) "
            f"ELSE array() END"
        )

    sel = [
        F.col(id_col),
        F.expr("size(_c)").alias("cand_len"),
        F.expr("size(_r)").alias("ref_len"),
    ]
    for n in range(1, n_max + 1):
        cg, rg = grams("_c", n), grams("_r", n)
        clip = (
            f"aggregate(transform(array_distinct({cg}), "
            f"g -> least(size(filter({cg}, x -> x = g)), "
            f"size(filter({rg}, x -> x = g)))), 0, (a, x) -> a + x)"
        )
        sel.append(F.expr(clip).cast("long").alias(f"clip_{n}"))
        sel.append(F.expr(f"size({cg})").cast("long").alias(f"tot_{n}"))
    scored = base.select(*sel)
    logs = []
    for n in range(1, n_max + 1):
        smooth = 0 if n == 1 else 1
        logs.append(
            F.log(
                (F.col(f"clip_{n}") + F.lit(smooth))
                / (F.col(f"tot_{n}") + F.lit(smooth))
            )
        )
    mean_log = sum(logs) / F.lit(float(n_max))
    bp = F.exp(
        F.least(
            F.lit(0.0),
            F.lit(1.0)
            - F.col("ref_len") / F.col("cand_len").cast("double"),
        )
    )
    bleu = F.when(
        (F.col("cand_len") > 0) & (F.col("clip_1") > 0),
        F.round(bp * F.exp(mean_log), 6),
    ).otherwise(F.lit(0.0))
    return scored.withColumn("bleu", bleu)


def zipf_fit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus diagnostic: least-squares fit of ln(freq) on
    ln(rank) over the word rank-frequency table — Zipf's law (natural-
    language corpora fit slope ≈ −1; machine-generated or heavily
    duplicated corpora drift off it, which makes the slope + r² a cheap
    corpus-quality / contamination monitor).

    Returns (n_types, n_tokens, slope, intercept, r2), floats rounded
    to 6 digits.  One shuffle (the word count); the ranking window runs
    over VOCABULARY cardinality, not corpus cardinality — for web-scale
    vocabularies cap the table (fit the top-N ranks) before calling."""
    from pyspark.sql import Window

    from vectordb_retrieval_spark.operators.dedup import tokens_expr

    counts = (
        df.select(F.explode(tokens_expr(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = counts.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("w")))
        .alias("rnk"),
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    s = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
        F.sum("cnt").alias("n_tokens"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return s.select(
        F.col("n").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )
