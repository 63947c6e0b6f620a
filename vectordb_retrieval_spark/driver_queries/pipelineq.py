"""Training-data pipeline driver queries: sequence packing, PII
scrubbing, deterministic sampling, quantile gating, shuffled export
shards.  All registered AFTER the driver's 50-slot boundary (catalogue
ordering contract in driver_queries.__init__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import docs
from vectordb_retrieval_spark.operators.packing import (
    pack_greedy,
    pack_spans,
    shuffle_shards,
)
from vectordb_retrieval_spark.operators.sampling import (
    _MOD,
    quantile_buckets,
    sample_hash_sql,
    quantile_gate,
    split_dataset,
    stratified_sample,
    take_per_stratum,
)
from vectordb_retrieval_spark.operators.scrub import pii_scrub

BUDGET = 256
N_SHARDS = 8
RATES = {"en": 0.8, "es": 0.5, "de": 0.25, "zh": 0.6}
DEFAULT_RATE = 0.1
STRAT_SEED = 7
TAKE_N = 20
TAKE_SEED = 3
SHUF_SHARDS = 4
SHUF_SEED = 11
GATE_Q = 0.75

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

# shared oracle CTE: per-doc shard + exclusive running token offset
_OFFS_CTE = f"""
WITH toks AS (
  SELECT doc_id, CAST(doc_id % {N_SHARDS} AS INT) AS shard,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
), offs AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS BIGINT) AS start_off
  FROM toks WHERE n_tokens > 0
)
"""


def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_greedy(docs(spark, sf_dir), BUDGET, N_SHARDS).orderBy(
        "doc_id"
    )


_PACK_GREEDY_ORACLE = f"""{_OFFS_CTE}
SELECT doc_id, shard,
       CAST(floor(start_off / {BUDGET}) AS INT) AS seq_id,
       CAST(start_off % {BUDGET} AS INT) AS seq_off,
       n_tokens
FROM offs ORDER BY doc_id
"""


def q_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_spans(docs(spark, sf_dir), BUDGET, N_SHARDS).orderBy(
        "doc_id", "seq_id"
    )


_PACK_SPANS_ORACLE = f"""{_OFFS_CTE},
spans AS (
  SELECT doc_id, shard, n_tokens, start_off,
         unnest(generate_series(
           CAST(floor(start_off / {BUDGET}) AS BIGINT),
           CAST(floor((start_off + n_tokens - 1) / {BUDGET}) AS BIGINT)
         )) AS seq_id
  FROM offs
)
SELECT doc_id, shard, CAST(seq_id AS INT) AS seq_id,
       CAST(greatest(seq_id * {BUDGET} - start_off, 0) AS INT) AS tok_start,
       CAST(least(seq_id * {BUDGET} + {BUDGET} - start_off, n_tokens) AS INT)
         AS tok_end
FROM spans ORDER BY doc_id, seq_id
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus text carries no PII (driver-generated word soup), so
    the query INJECTS a deterministic per-doc footer — an email, an IP,
    and (every third doc) an SSN + phone — then scrubs it back out.
    Counts + cleaned length are the checked surface."""
    d = docs(spark, sf_dir).select("doc_id", "text")
    footer = F.concat(
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex.com ip 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".1"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.lit(" ssn 123-45-6789 call +1 (415) 555-0134"),
        ).otherwise(F.lit("")),
    )
    injected = d.withColumn("text", F.concat(F.col("text"), footer))
    out = pii_scrub(injected)
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_ip",
        "n_phone",
        F.length("text_clean").alias("clean_len"),
    ).orderBy("doc_id")


_PII_ORACLE = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com ip 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.1'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' ssn 123-45-6789 call +1 (415) 555-0134'
                      ELSE '' END AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM injected
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
         regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ssn,
         CAST(len(regexp_extract_all(t,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
         regexp_replace(t,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
  FROM s2
), s4 AS (
  SELECT doc_id, n_email, n_ssn, n_ip,
         CAST(len(regexp_extract_all(t,
           '(?:\+\d{7,14}\b|(?:\+?\d{1,3}[-. ])?\(?\b\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b)')) AS INT) AS n_phone,
         regexp_replace(t,
           '(?:\+\d{7,14}\b|(?:\+?\d{1,3}[-. ])?\(?\b\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b)', '<PHONE>', 'g') AS t
  FROM s3
)
SELECT doc_id, n_email, n_ssn, n_ip, n_phone, CAST(length(t) AS INT) AS clean_len
FROM s4 ORDER BY doc_id
"""


def _hash_sql(seed: int) -> str:
    return sample_hash_sql("doc_id", seed)


BERN_RATE = 0.35
BERN_SEED = 5


def q_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain deterministic Bernoulli sample — the direct oracle check on
    the widened 2^31−1 hash coin (round-9; the stratified/split queries
    exercise it only through CASE thresholds)."""
    from vectordb_retrieval_spark.operators.sampling import hash_sample

    return (
        hash_sample(docs(spark, sf_dir), BERN_RATE, BERN_SEED)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _bernoulli_oracle() -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_hash_sql(BERN_SEED)} < {int(BERN_RATE * _MOD)}
ORDER BY doc_id
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        stratified_sample(
            docs(spark, sf_dir), "lang", RATES, DEFAULT_RATE, STRAT_SEED
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _stratified_oracle() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {int(r * _MOD)}" for k, r in sorted(RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_hash_sql(STRAT_SEED)} <
      CASE lang {cases} ELSE {int(DEFAULT_RATE * _MOD)} END
ORDER BY doc_id
"""


def q_sample_top_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        take_per_stratum(docs(spark, sf_dir), "lang", TAKE_N, TAKE_SEED)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_TAKE_ORACLE = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY {_hash_sql(TAKE_SEED)}, doc_id) AS rn
  FROM documents
) WHERE rn <= {TAKE_N} ORDER BY doc_id
"""


def q_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        quantile_gate(docs(spark, sf_dir), "n_chars", GATE_Q, keep="above")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


_GATE_ORACLE = f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_cont(n_chars, {GATE_Q}) FROM documents)
ORDER BY doc_id
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        shuffle_shards(docs(spark, sf_dir), SHUF_SHARDS, SHUF_SEED)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    )


_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_hash_sql(SHUF_SEED)} AS hv FROM documents
)
SELECT doc_id, CAST(hv % {SHUF_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % {SHUF_SHARDS}
         ORDER BY hv, doc_id) - 1 AS INT) AS pos
FROM h ORDER BY doc_id
"""


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = 21


def q_split_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        split_dataset(docs(spark, sf_dir), SPLIT_WEIGHTS, SPLIT_SEED)
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


def _split_oracle() -> str:
    total = sum(SPLIT_WEIGHTS.values())
    labels = sorted(SPLIT_WEIGHTS)
    acc, whens = 0.0, []
    for name in labels[:-1]:
        acc += SPLIT_WEIGHTS[name] / total
        whens.append(f"WHEN {_hash_sql(SPLIT_SEED)} < {int(acc * _MOD)} "
                     f"THEN '{name}'")
    return f"""
SELECT doc_id, CASE {' '.join(whens)} ELSE '{labels[-1]}' END AS split
FROM documents ORDER BY doc_id
"""


N_BUCKETS = 10


def q_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        quantile_buckets(docs(spark, sf_dir), "n_chars", N_BUCKETS)
        .select("doc_id", "n_chars", "bucket")
        .orderBy("doc_id")
    )


def _buckets_oracle() -> str:
    qs = ", ".join(repr(i / N_BUCKETS) for i in range(1, N_BUCKETS))
    return f"""
WITH thr AS (SELECT quantile_cont(n_chars, [{qs}]) AS t FROM documents)
SELECT doc_id, n_chars,
       CAST(len(list_filter(thr.t, x -> n_chars >= x)) AS INT) AS bucket
FROM documents, thr ORDER BY doc_id
"""


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation path in ONE call — PII scrub → quality gate
    (shared tokenization) → exact-dedup keepers over the survivors →
    train/val/test split → greedy sequence packing — emitting one row
    per surviving doc:
    (doc_id, split, clean_len, shard, seq_id, seq_off, n_tokens).
    One scan + two shuffles (operators/curate.py); the composed result
    is hash-checked end to end, so stage wiring (window keys, carried
    columns, filter order) is covered too."""
    from vectordb_retrieval_spark.operators.curate import curate_corpus

    return curate_corpus(
        docs(spark, sf_dir).select("doc_id", "text"),
        SPLIT_WEIGHTS,
        BUDGET,
        N_SHARDS,
        SPLIT_SEED,
    ).orderBy("doc_id")


def _curate_oracle() -> str:
    from vectordb_retrieval_spark.driver_queries.textq import (
        _CANON,
        _sql_str_list,
    )
    from vectordb_retrieval_spark.operators.textops import STOPWORDS

    total = sum(SPLIT_WEIGHTS.values())
    labels = sorted(SPLIT_WEIGHTS)
    acc, whens = 0.0, []
    for name in labels[:-1]:
        acc += SPLIT_WEIGHTS[name] / total
        whens.append(
            f"WHEN {_hash_sql(SPLIT_SEED)} < {int(acc * _MOD)} THEN '{name}'"
        )
    split_case = f"CASE {' '.join(whens)} ELSE '{labels[-1]}' END"
    stop = _sql_str_list(STOPWORDS["en"])
    # text_clean == text on this corpus (driver word soup carries no
    # PII — same invariant the r8 oracle used); quality gate BEFORE
    # dedup, keeper = first quality-passing id per canonical text
    # (row_number window, mirroring the curate_corpus plan).
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id, text, len(toks) AS n,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         list_sum(list_transform(toks, x -> length(x))) AS chars,
         len(list_filter(toks, x -> list_contains({stop}, x))) AS n_stop,
         list_max(list_transform(list_distinct(toks),
             w -> len(list_filter(toks, x -> x = w)))) AS top
  FROM t
),
q AS (
  SELECT doc_id, text, n_tokens FROM f
  WHERE n >= 20 AND n <= 400 AND chars >= 2 * n AND chars <= 12 * n
    AND n_stop > 0 AND top * 5 <= n
),
k AS (
  SELECT doc_id, text, n_tokens,
         row_number() OVER (PARTITION BY {_CANON} ORDER BY doc_id) AS rn
  FROM q
),
sp AS (
  SELECT doc_id, {split_case} AS split,
         CAST(length(text) AS INT) AS clean_len,
         CAST(doc_id % {N_SHARDS} AS INT) AS shard,
         n_tokens
  FROM k WHERE rn = 1
),
offs AS (
  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS BIGINT) AS start_off
  FROM sp WHERE n_tokens > 0
)
SELECT doc_id, split, clean_len, shard,
       CAST(floor(start_off / {BUDGET}) AS INT) AS seq_id,
       CAST(start_off % {BUDGET} AS INT) AS seq_off,
       n_tokens
FROM offs ORDER BY doc_id
"""


ALPHA = 0.5


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordb_retrieval_spark.operators.textops import unigram_logprob

    return unigram_logprob(docs(spark, sf_dir), alpha=ALPHA).orderBy(
        "doc_id"
    )


_LOGPROB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
freq AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM freq)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(log10((c + {ALPHA}) / (n + {ALPHA} * v))), 6) AS logprob
FROM toks JOIN freq USING (term) CROSS JOIN tot
GROUP BY doc_id ORDER BY doc_id
"""


KW_TOP = 3


def q_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordb_retrieval_spark.operators.textops import keyword_extract

    return keyword_extract(docs(spark, sf_dir), KW_TOP).orderBy(
        "doc_id", "rank"
    )


_KEYWORD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
r AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(1.0 + nd.n / dfreq.df) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(1.0 + nd.n / dfreq.df) DESC, tf.term
         ) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
)
SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank
FROM r WHERE rank <= {KW_TOP} ORDER BY doc_id, rank
"""


CHUNK_T = 40
CHUNK_OVR = 10
_CHUNK_STRIDE = CHUNK_T - CHUNK_OVR


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectordb_retrieval_spark.operators.textops import chunk_documents

    return chunk_documents(docs(spark, sf_dir), CHUNK_T, CHUNK_OVR).orderBy(
        "doc_id", "chunk_id"
    )


_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
st AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0,
           CAST(greatest(n - {CHUNK_OVR} - 1, 0) AS BIGINT),
           {_CHUNK_STRIDE})) AS s0
  FROM s
)
SELECT doc_id,
       CAST(s0 // {_CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(s0 AS INT) AS tok_start,
       CAST(least(s0 + {CHUNK_T}, n) AS INT) AS tok_end,
       CAST(least(s0 + {CHUNK_T}, n) - s0 AS INT) AS n_tokens,
       array_to_string(
         list_slice(toks, CAST(s0 + 1 AS BIGINT),
                    CAST(least(s0 + {CHUNK_T}, n) AS BIGINT)), ' ')
         AS chunk_text
FROM st ORDER BY doc_id, chunk_id
"""


QUERIES = {
    "pack_greedy_sequences": q_pack_greedy,
    "text_keyword_extract": q_keyword_extract,
    "text_unigram_logprob": q_unigram_logprob,
    "pipeline_curate_corpus": q_curate_corpus,
    "curriculum_quantile_buckets": q_quantile_buckets,
    "dataset_split_hash": q_split_dataset,
    "pack_token_spans": q_pack_spans,
    "pii_scrub_counts": q_pii_scrub,
    "sample_stratified_hash": q_sample_stratified,
    "sample_top_per_stratum": q_sample_top_per_stratum,
    "quality_quantile_gate": q_quantile_gate,
    "shuffle_export_shards": q_shuffle_shards,
    "sample_bernoulli_hash": q_sample_bernoulli,
    "chunk_documents_sliding": q_chunk_documents,
}

ORACLES = {
    "pack_greedy_sequences": _PACK_GREEDY_ORACLE,
    "text_keyword_extract": _KEYWORD_ORACLE,
    "text_unigram_logprob": _LOGPROB_ORACLE,
    "pipeline_curate_corpus": _curate_oracle(),
    "curriculum_quantile_buckets": _buckets_oracle(),
    "dataset_split_hash": _split_oracle(),
    "pack_token_spans": _PACK_SPANS_ORACLE,
    "pii_scrub_counts": _PII_ORACLE,
    "sample_stratified_hash": _stratified_oracle(),
    "sample_top_per_stratum": _TAKE_ORACLE,
    "quality_quantile_gate": _GATE_ORACLE,
    "shuffle_export_shards": _SHUFFLE_ORACLE,
    "sample_bernoulli_hash": _bernoulli_oracle(),
    "chunk_documents_sliding": _CHUNK_ORACLE,
}
