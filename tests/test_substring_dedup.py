"""Unit tests for exact substring (span-level) dedup and SemDeDup.

Hand-built corpora with planted duplicated spans / semantic clusters;
the sf0.01 oracle gate (tools/check_oracle.py: substring_dup_spans,
substring_dedup_cut, semantic_dedup_fixed) covers full-scale parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from vectordb_retrieval_spark.operators.dedup import semantic_dedup
from vectordb_retrieval_spark.operators.substring import (
    duplicated_spans,
    gram_positions,
    substring_dedup,
)

# Two docs share the 8-token run "a b c d e f g h"; doc 2 repeats an
# internal 6-token run of itself; doc 3 is short and unique.
_SHARED = "a b c d e f g h"
_CORPUS = [
    (0, f"zero intro {_SHARED} zero outro words here"),
    (1, f"one opening words {_SHARED} and a unique one tail"),
    (2, "p q r s t u filler filler2 p q r s t u trailer"),
    (3, "tiny unique doc"),
    (4, ""),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_CORPUS, schema="doc_id long, text string")


def test_gram_positions_count_and_base(spark, corpus):
    k = 6
    g = gram_positions(corpus, k).toPandas()
    # each doc with n >= k tokens contributes n - k + 1 windows, 1-based
    lens = {i: len(t.split()) for i, t in _CORPUS if t.split()}
    want = sum(max(0, n - k + 1) for n in lens.values())
    assert len(g) == want
    assert g["pos"].min() == 1
    by_doc = g.groupby("id")["pos"].max().to_dict()
    for i, n in lens.items():
        if n >= k:
            assert by_doc[i] == n - k + 1


def test_duplicated_spans_planted(spark, corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(corpus, k=6, min_count=2).collect()
    }
    # docs 0/1 share an 8-token run -> one maximal span each, exactly
    # covering the run (tokens are 1-based):
    # doc 0: "zero intro" -> run at 3..10; doc 1: 3 lead tokens -> 4..11
    assert (0, 3, 10) in spans
    assert (1, 4, 11) in spans
    # doc 2's internal repeat "p q r s t u" at 1..6 and 9..14: the two
    # window starts (1 and 9) differ by 8 > k=6, so two separate spans
    assert (2, 1, 6) in spans
    assert (2, 9, 14) in spans
    # nothing from the short/empty docs
    assert all(d in (0, 1, 2) for d, _, _ in spans)


def test_duplicated_spans_merge_adjacent(spark):
    # one long duplicated run -> consecutive window starts merge into
    # ONE maximal span, not one span per window
    run = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(0, f"x {run} y"), (1, f"{run} z tail")],
        schema="doc_id long, text string",
    )
    spans = duplicated_spans(df, k=6, min_count=2).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in spans}
    assert got == {(0, 2, 13, 7), (1, 1, 12, 7)}


def test_substring_dedup_cut_rebuilds_text(spark, corpus):
    out = {r.doc_id: r for r in substring_dedup(corpus, k=6, min_count=2).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # doc 3: untouched; hash of its own canonical join
    assert out[3].n_removed == 0
    assert out[3].text_hash == hashlib.md5(b"tiny unique doc").hexdigest()
    # doc 4: empty text -> empty rebuild
    assert out[4].n_tokens == 0
    assert out[4].text_hash == hashlib.md5(b"").hexdigest()
    # doc 0: the shared 8-token run is cut (tokens 3..10)
    kept0 = "zero intro zero outro words here"
    assert out[0].n_removed == 8
    assert out[0].text_hash == hashlib.md5(kept0.encode()).hexdigest()
    # doc 2: both copies of the repeated run are cut
    kept2 = "filler filler2 trailer"
    assert out[2].n_removed == 12
    assert out[2].text_hash == hashlib.md5(kept2.encode()).hexdigest()
    # n_tokens preserved from the input
    assert out[0].n_tokens == len(_CORPUS[0][1].split())


def test_substring_dedup_no_dups_identity(spark):
    df = spark.createDataFrame(
        [(0, "all words here differ"), (1, "completely other content now")],
        schema="doc_id long, text string",
    )
    out = substring_dedup(df, k=3, min_count=2).collect()
    assert all(r.n_removed == 0 for r in out)


def test_substring_plans_have_no_unpartitioned_window(spark, corpus):
    """Every window in the substring pipeline must carry a partition
    key (gh for the dup-count, id for the span merge) — a bare window
    would funnel the corpus through one task at scale."""
    for df in (
        duplicated_spans(corpus, k=6, min_count=2),
        substring_dedup(corpus, k=6, min_count=2),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        specs = plan.split("windowspecdefinition(")[1:]
        assert specs, plan
        assert all(s.startswith(("gh", "id")) for s in specs), plan


def _cluster_fixture(spark):
    """3 tight clusters of 4 vectors each + 2 far-out singletons; the
    first 3 vectors double as centroids."""
    rng = np.random.RandomState(7)
    centers = np.eye(3, 8, dtype=np.float64) * 10.0
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(4):
            v = centers[c] + rng.randn(8) * 0.01
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for v in (-np.ones(8) * 5.0, np.array([0, 0, 0, 0, 9, -9, 9, -9.0])):
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    cents = np.stack([np.array(rows[i][1]) for i in (0, 4, 8)]).astype(np.float32)
    return df, cents


def test_semantic_dedup_keeps_lowest_id_per_cluster(spark):
    df, cents = _cluster_fixture(spark)
    out = semantic_dedup(df, cents, threshold=0.9).toPandas()
    keep = set(out["vec_id"])
    # within each tight cluster only the lowest id survives; the two
    # far-out vectors are not similar to any lower-id cluster-mate
    assert keep == {0, 4, 8, 12, 13}
    # survivors carry their cluster assignment
    assert set(out.columns) == {"vec_id", "cluster_id"}


def test_semantic_dedup_cluster_size_guard(spark):
    df, cents = _cluster_fixture(spark)
    with pytest.raises(ValueError, match="max_cluster_rows"):
        semantic_dedup(df, cents, threshold=0.9, max_cluster_rows=3)
    # the override runs and matches the unguarded result
    out = semantic_dedup(
        df, cents, threshold=0.9, max_cluster_rows=3, allow_quadratic=True
    ).toPandas()
    assert set(out["vec_id"]) == {0, 4, 8, 12, 13}


def test_semantic_dedup_threshold_monotone(spark):
    df, cents = _cluster_fixture(spark)
    hi = set(semantic_dedup(df, cents, threshold=0.999999).toPandas()["vec_id"])
    lo = set(semantic_dedup(df, cents, threshold=0.5).toPandas()["vec_id"])
    # lower threshold drops at least as many
    assert lo <= hi
    assert 0 in lo and 4 in lo and 8 in lo  # keepers never dropped


def test_curate_web_pipeline_stages(spark):
    from vectordb_retrieval_spark.operators.curate import curate_web

    run = " ".join(f"s{i}" for i in range(8))
    rows = [
        # 0 and 1 share a normalized URL -> 1 dropped at the URL stage
        (
            0,
            "alpha beta " + " ".join(f"x{i}" for i in range(12)),
            "http://A.com/p?utm_source=z",
        ),
        (1, "totally different words here now", "http://www.a.com/p/"),
        # 2 and 3 share an 8-token run -> cut from both
        (2, f"lead {run} tail0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "http://b.com/1"),
        (3, f"{run} other2 u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "http://b.com/2"),
        # 4 is too short after nothing is cut -> gated out
        (4, "tiny doc", "http://c.com/1"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, url string")
    out = {r.doc_id: r for r in curate_web(df, k=6, min_count=2, min_tokens=5).collect()}
    # URL stage: doc 1 gone (0 is the keeper); gate: doc 4 gone
    assert set(out) == {0, 2, 3}
    # cut accounting: docs 2/3 lost the 8-token run
    assert out[2].clean_len == len(rows[2][1].split()) - 8
    assert out[3].clean_len == len(rows[3][1].split()) - 8
    assert out[0].clean_len == len(rows[0][1].split())
    # split labels come from the declared weights
    assert {r.split for r in out.values()} <= {"train", "val", "test"}


def test_semantic_dedup_gemm_and_fold_plans_identical(spark):
    """The GEMM pair kernel (scale route) and the column-expression fold
    (oracle twin) produce the identical survivor set — including at a
    boundary-straddling threshold, where the 1e-6 sequential recheck is
    what keeps the plans bit-identical."""
    df, cents = _cluster_fixture(spark)
    for th in (0.9, 0.5, 0.999999):
        gemm = semantic_dedup(df, cents, threshold=th, pair_plan="gemm").toPandas()
        fold = semantic_dedup(df, cents, threshold=th, pair_plan="fold").toPandas()
        assert sorted(map(tuple, gemm.values.tolist())) == sorted(
            map(tuple, fold.values.tolist())
        ), th
    # exact-boundary case: identical unit vectors, threshold exactly 1.0
    # lands inside the recheck band on both plans
    dup = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        schema="vec_id long, embedding array<float>",
    )
    import numpy as np

    c1 = np.array([[1.0, 0.0]], dtype=np.float32)
    g = set(semantic_dedup(dup, c1, threshold=1.0, pair_plan="gemm").toPandas()["vec_id"])
    f = set(semantic_dedup(dup, c1, threshold=1.0, pair_plan="fold").toPandas()["vec_id"])
    assert g == f == {0, 2}
    with pytest.raises(ValueError, match="pair_plan"):
        semantic_dedup(df, cents, pair_plan="nope")


def test_substring_hot_gram_guard_parity_and_plan(spark):
    """max_gram_df hot-key guard: a corpus dominated by one boilerplate
    gram produces the identical span set with the guard on, and the
    guarded plan routes hot grams through broadcast joins (the count
    window only ever sees cold keys)."""
    from pyspark.sql import functions as F

    from vectordb_retrieval_spark.operators.substring import (
        duplicated_spans,
        substring_dedup,
    )

    # every doc shares the boilerplate prefix (the hot gram, df = n);
    # docs also pairwise-share a planted 8-token run every 10 ids
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to all content here "),
            F.lit("u"), F.col("id").cast("string"), F.lit(" "),
            F.when(
                F.col("id") % 10 < 2,
                F.lit("shared run alpha beta gamma delta epsilon zeta"),
            ).otherwise(
                F.concat(F.lit("tail "), (F.col("id") * 7).cast("string"))
            ),
        ).alias("text"),
    )
    plain = {
        tuple(r) for r in duplicated_spans(df, k=6, min_count=2).collect()
    }
    guarded_df = duplicated_spans(df, k=6, min_count=2, max_gram_df=100)
    guarded = {tuple(r) for r in guarded_df.collect()}
    assert guarded == plain and len(plain) >= n  # hot prefix spans every doc
    # the guarded plan broadcasts the hot-key flag and salts the count
    # window so hot grams spread across sub-buckets
    plan = guarded_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "salt" in plan, plan
    # the cut composes identically
    cut_plain = {
        (r.doc_id, r.n_removed, r.text_hash)
        for r in substring_dedup(df, k=6, min_count=2).collect()
    }
    cut_guard = {
        (r.doc_id, r.n_removed, r.text_hash)
        for r in substring_dedup(df, k=6, min_count=2, max_gram_df=100).collect()
    }
    assert cut_guard == cut_plain
    with pytest.raises(ValueError, match="max_gram_df"):
        duplicated_spans(df, k=6, min_count=5, max_gram_df=3).collect()


def test_semantic_dedup_degenerate_rows_plan_parity(spark):
    """Degenerate embeddings, pinned on BOTH plans: a zero-norm vector
    has an undefined cosine (fold nulls the division instead of an
    ANSI divide-by-zero crash) and SURVIVES; a NaN vector's cosine is
    NaN, which Spark orders above every number, so NaN pairs DROP the
    higher id."""
    c1 = np.array([[1.0, 0.0]], dtype=np.float32)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 0.0]),           # zero-norm -> undefined cos -> keep
        (2, [0.1, 0.9]),           # genuinely dissimilar -> keep
        (3, [float("nan"), 1.0]),  # NaN -> drops (pair with id 0)
        (4, [-1.0, 0.1]),          # dissimilar, but pairs with NaN id 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = semantic_dedup(df, c1, threshold=0.9, pair_plan="gemm").toPandas()
    f = semantic_dedup(df, c1, threshold=0.9, pair_plan="fold").toPandas()
    assert set(g["vec_id"]) == set(f["vec_id"]) == {0, 1, 2}
    # non-positive threshold (r10 advisor finding): a zero-norm pair
    # scores 0 in the GEMM kernel, which passes `cos >= threshold` for
    # threshold <= 0 — the fold's null cosine never does.  The GEMM
    # plan masks zero-norm pairs, so the zero-norm row survives at ANY
    # threshold on both plans; every finite pair has cos >= -0.5 here
    # except (0,4), and NaN drops 3 and 4 regardless.
    g2 = semantic_dedup(df, c1, threshold=-0.5, pair_plan="gemm").toPandas()
    f2 = semantic_dedup(df, c1, threshold=-0.5, pair_plan="fold").toPandas()
    assert set(g2["vec_id"]) == set(f2["vec_id"]) == {0, 1}


def _py_winnow(texts, k, w):
    """Pure-python winnowing reference: per window of w consecutive
    k-gram hashes, pick the rightmost minimum (40-bit reduced hash)."""
    import hashlib

    out = set()
    for did, t in texts:
        toks = t.split()
        hs = []
        for p in range(len(toks) - k + 1):
            gram = " ".join(toks[p : p + k])
            h60 = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            hs.append(h60 >> 20)
        for s in range(len(hs) - w + 1):
            win = hs[s : s + w]
            m = min(win)
            q = max(j for j in range(w) if win[j] == m)
            out.add((did, s + q + 1, m))  # 1-based gram position
    return out


def test_winnow_fingerprints_matches_python_reference(spark):
    from vectordb_retrieval_spark.operators.substring import (
        winnow_fingerprints,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog while cats sleep"),
        (2, "completely different words in every position of this doc"),
        (3, "short doc"),  # fewer than k tokens -> no fingerprints
        (4, "rep rep rep rep rep rep rep rep rep rep"),  # all-tie windows
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=5, window=4).collect()
    }
    want = _py_winnow(texts, 5, 4)
    assert got == want
    # the winnowing GUARANTEE applies: docs 0 and 1 share a 9-token
    # prefix >= k + w - 1 = 8, i.e. grams 1..5 are shared and windows
    # [1..4], [2..5] are fully shared — so a common (pos, fp) inside
    # the prefix is guaranteed, not hash luck
    shared = {
        (p, f) for (d, p, f) in got if d == 0 and p <= 5
    } & {(p, f) for (d, p, f) in got if d == 1 and p <= 5}
    assert shared
    assert not any(d == 3 for d, _, _ in got)
    # all-tie doc: rightmost-min rule picks the last position of each
    # window; selection is still ~1 per window, never every position
    assert {p for d, p, _ in got if d == 4} == {4, 5, 6}


def test_domain_cap(spark):
    from vectordb_retrieval_spark.operators.urlops import domain_cap

    rows = [
        (i, f"http://{'big' if i < 6 else 'small'}.com/p{i}") for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r.doc_id for r in domain_cap(df, 3).collect())
    # big.com has 6 docs -> lowest 3 ids kept; small.com has 2 -> both
    assert kept == [0, 1, 2, 6, 7]
    with pytest.raises(ValueError, match="max_per_domain"):
        domain_cap(df, 0)


def test_gram_novelty(spark):
    from vectordb_retrieval_spark.operators.substring import gram_novelty

    run = " ".join(f"c{i}" for i in range(6))
    df = spark.createDataFrame(
        [
            (0, f"{run} unique zero words here now"),   # shares the run
            (1, f"{run} other one tail w x y z"),       # shares the run
            (2, "all original content in this doc yes"),  # fully novel
            (3, "tiny"),                                 # < k tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gram_novelty(df, k=6).collect()}
    assert 3 not in out
    assert out[2].novelty_pm == 1000 and out[2].n_novel == out[2].n_grams
    # docs 0/1: exactly one shared 6-gram (the run itself); every other
    # window mixes unique suffix tokens
    for d in (0, 1):
        assert out[d].n_grams - out[d].n_novel == 1
        assert out[d].novelty_pm == (out[d].n_novel * 1000) // out[d].n_grams


def test_winnow_plan_windows_are_doc_partitioned(spark, corpus):
    """Winnowing's selection windows must partition by doc id — a bare
    window would funnel every gram through one task at scale."""
    from vectordb_retrieval_spark.operators.substring import (
        winnow_fingerprints,
    )

    plan = (
        winnow_fingerprints(corpus, k=5, window=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs, plan
    assert all(s.startswith("id") for s in specs), plan
