"""Dedup driver queries over the documents/embeddings tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_retrieval_spark.driver_queries.common import docs, emb
from vectordb_retrieval_spark.operators.dedup import (
    MERSENNE_P,
    connected_components,
    embedding_lsh_near_dup_pairs,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    minhash_verified_pairs,
    near_dup_dedup,
    ngram_jaccard_pairs,
    perm_coeffs,
    simhash_near_dup_pairs,
)

N_PERM, BANDS, SHINGLE_N = 8, 4, 3
JACCARD_SUBSET, JACCARD_T = 200, 0.5
COSINE_T = 0.4
SIMHASH_BITS = 16
HAMMING_D = 2

# -------------------------------------------------- shared SQL fragments

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)


def _h60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


_COEFFS = perm_coeffs(N_PERM)
_PERM_ROWS = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(_COEFFS))

_SIG_CTE = f"""
toks AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
sh AS (
  SELECT id, unnest({_SHINGLES}) AS s
  FROM toks WHERE len(toks) >= {SHINGLE_N}
),
h AS (SELECT id, {_h60("s")} % {MERSENNE_P} AS h FROM sh),
perms AS (SELECT * FROM (VALUES {_PERM_ROWS}) t(j, a, b)),
hashed AS (
  SELECT id, j AS perm, (a * h + b) % {MERSENNE_P} AS hv
  FROM h CROSS JOIN perms
),
sigs AS (SELECT id, perm, min(hv) AS minhash FROM hashed GROUP BY id, perm)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(docs(spark, sf_dir))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(docs(spark, sf_dir), N_PERM, SHINGLE_N)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(docs(spark, sf_dir), N_PERM, BANDS, SHINGLE_N)


def q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full production dedup pipeline: banded MinHash candidates →
    exact Jaccard ≥ t verification."""
    return minhash_verified_pairs(
        docs(spark, sf_dir), JACCARD_T, N_PERM, BANDS, SHINGLE_N
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup components: verified MinHash pairs → min-label connected
    components (the grouping step that turns a pair list into dedup
    clusters)."""
    pairs = minhash_verified_pairs(
        docs(spark, sf_dir), JACCARD_T, N_PERM, BANDS, SHINGLE_N
    )
    return connected_components(pairs)


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: the corpus minus every non-canonical near-dup
    (one keeper — the min doc_id — per component)."""
    d = docs(spark, sf_dir)
    pairs = minhash_verified_pairs(d, JACCARD_T, N_PERM, BANDS, SHINGLE_N)
    return near_dup_dedup(d, pairs).select("doc_id")


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded simhash near-dup pairs; the pigeonhole banding
    makes candidates a superset of all qualifying pairs, so the result
    equals the oracle's quadratic bit_count(xor) filter exactly.

    Emits the two fingerprints alongside each pair
    (``include_simhash=True``) so this single catalogue entry pins the
    simhash computation itself as well as the Hamming distances —
    subsuming the former standalone ``dedup_simhash`` query (merged to
    keep the catalogue within the driver's 50-row verification budget;
    ``simhash`` alone remains unit-tested in test_dedup_text)."""
    return simhash_near_dup_pairs(
        docs(spark, sf_dir), HAMMING_D, SIMHASH_BITS, include_simhash=True
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_SUBSET)
    return ngram_jaccard_pairs(d, JACCARD_T, SHINGLE_N)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(emb(spark, sf_dir), COSINE_T)


def q_embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: same threshold as dedup_embedding_cosine but
    candidates restricted to sign-LSH bucket collisions (the identical
    seeded projections are inlined into the oracle SQL)."""
    return embedding_lsh_near_dup_pairs(emb(spark, sf_dir), COSINE_T)


_DEDUP_EXACT_ORACLE = r"""
SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
FROM (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
  FROM documents
)
GROUP BY t
"""

_SIG_ORACLE = f"WITH {_SIG_CTE} SELECT id, perm, minhash FROM sigs"

_LSH_PAIRS_ORACLE = f"""
WITH {_SIG_CTE},
banded AS (
  SELECT id, perm // {N_PERM // BANDS} AS band,
         string_agg(CAST(minhash AS VARCHAR), '_'
                    ORDER BY CAST(minhash AS VARCHAR)) AS bucket
  FROM sigs GROUP BY id, perm // {N_PERM // BANDS}
)
SELECT DISTINCT a.id AS a, b.id AS b
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.id < b.id
"""


def _simhash_oracle(bits: int) -> str:
    sums = ",\n".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN s{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return f"""
WITH toks AS (SELECT doc_id AS id, {_TOKS} AS toks FROM documents),
tok AS (SELECT id, unnest(toks) AS tk FROM toks),
h AS (SELECT id, {_h60("tk")} AS h FROM tok),
sums AS (SELECT id, {sums} FROM h GROUP BY id)
SELECT id, CAST({combine} AS BIGINT) AS simhash FROM sums
"""


# verified-pairs chain: band candidates → exact-Jaccard filter, ending in
# vpairs(a, b, jaccard); shared by the verified / components / canonical oracles
_VERIFIED_CHAIN = f"""{_SIG_CTE},
banded AS (
  SELECT id, perm // {N_PERM // BANDS} AS band,
         string_agg(CAST(minhash AS VARCHAR), '_'
                    ORDER BY CAST(minhash AS VARCHAR)) AS bucket
  FROM sigs GROUP BY id, perm // {N_PERM // BANDS}
),
cand AS (
  SELECT DISTINCT a.id AS a, b.id AS b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.id < b.id
),
sets AS (
  SELECT id, {_SHINGLES} AS sh
  FROM toks WHERE len(toks) >= {SHINGLE_N}
),
vpairs AS (
  SELECT c.a, c.b,
         round(len(list_intersect(x.sh, y.sh)) * 1.0
               / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
  FROM cand c JOIN sets x ON x.id = c.a JOIN sets y ON y.id = c.b
  WHERE len(list_intersect(x.sh, y.sh)) * 1.0
        / len(list_distinct(list_concat(x.sh, y.sh))) >= {JACCARD_T}
)"""

_MINHASH_VERIFIED_ORACLE = f"WITH {_VERIFIED_CHAIN} SELECT a, b, jaccard FROM vpairs"

# transitive closure over the verified-pair graph; component = min reachable id
_COMPONENTS_CHAIN = f"""{_VERIFIED_CHAIN},
edges AS (
  SELECT a AS src, b AS dst FROM vpairs
  UNION
  SELECT b AS src, a AS dst FROM vpairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src
)"""

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_COMPONENTS_CHAIN}
SELECT id, component FROM comp
"""

_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_COMPONENTS_CHAIN}
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp WHERE component < id)
"""

_SIMHASH_PAIRS_ORACLE = f"""
WITH s AS ({_simhash_oracle(SIMHASH_BITS)})
SELECT a.id AS a, b.id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
       a.simhash AS simhash_a, b.simhash AS simhash_b
FROM s a JOIN s b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_D}
"""

_JACCARD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < {JACCARD_SUBSET}
),
t AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM toks WHERE len(toks) >= {SHINGLE_N}
)
SELECT a.doc_id AS a, b.doc_id AS b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * 1.0
      / len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_T}
"""

_NEAR_DUP_ORACLE = f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE 1.0 - (1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])))
      > {COSINE_T}
"""


def _lsh_near_dup_oracle() -> str:
    # identical sign-LSH config (dim 64, 2 tables, 8 bits, seed 42) as
    # the ann module's bucket queries — reuse its projection-inlined SQL
    from vectordb_retrieval_spark.driver_queries.ann import (
        SIGN_TABLES,
        _buckets_oracle,
        _sign_bucket_expr,
    )

    bh = _buckets_oracle(_sign_bucket_expr, SIGN_TABLES)
    return f"""
WITH bh AS ({bh}),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bh x JOIN bh y
    ON x.table_id = y.table_id AND x.bucket = y.bucket AND x.id < y.id
)
SELECT c.a, c.b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) > {COSINE_T}
"""

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_signatures": q_minhash_signatures,
    "dedup_minhash_lsh_pairs": q_minhash_lsh_pairs,
    "dedup_minhash_verified": q_minhash_verified,
    "dedup_components": q_dedup_components,
    "dedup_canonical": q_dedup_canonical,
    "dedup_simhash_pairs": q_simhash_near_dup,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "dedup_embedding_cosine": q_embedding_near_dup,
    "dedup_embedding_lsh": q_embedding_lsh_near_dup,
}

ORACLES = {
    "dedup_exact": _DEDUP_EXACT_ORACLE,
    "dedup_minhash_signatures": _SIG_ORACLE,
    "dedup_minhash_lsh_pairs": _LSH_PAIRS_ORACLE,
    "dedup_minhash_verified": _MINHASH_VERIFIED_ORACLE,
    "dedup_components": _COMPONENTS_ORACLE,
    "dedup_canonical": _CANONICAL_ORACLE,
    "dedup_simhash_pairs": _SIMHASH_PAIRS_ORACLE,
    "dedup_ngram_jaccard": _JACCARD_ORACLE,
    "dedup_embedding_cosine": _NEAR_DUP_ORACLE,
    "dedup_embedding_lsh": _lsh_near_dup_oracle(),
}
