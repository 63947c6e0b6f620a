"""Training-pipeline operators: sequence packing, PII scrub, sampling,
quantile gating, shuffled export shards."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectordb_retrieval_spark.operators.packing import (
    pack_greedy,
    pack_spans,
    shuffle_shards,
)
from vectordb_retrieval_spark.operators.sampling import (
    hash_sample,
    quantile_gate,
    stratified_sample,
    take_per_stratum,
)
from vectordb_retrieval_spark.operators.scrub import pii_scrub, pii_stats

BUDGET = 32


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic doc lengths: 1..40 tokens, 4 langs
    rows = [
        (i, " ".join(f"w{j}" for j in range(1 + i % 40)), ["en", "es", "de", "zh"][i % 4])
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).cache()


def test_pack_greedy_invariants(spark, corpus):
    out = pack_greedy(corpus, BUDGET, n_shards=4).collect()
    assert len(out) == 200
    by_doc = {r["doc_id"]: r for r in out}
    # token counts match the text
    for i in range(200):
        assert by_doc[i]["n_tokens"] == 1 + i % 40
        assert by_doc[i]["shard"] == i % 4
    # within a (shard, seq): offsets are contiguous in doc order and
    # every seq STARTS under budget (overflow < one doc is allowed)
    for r in out:
        assert 0 <= r["seq_off"] < BUDGET
    # exclusive-cumsum consistency: start offsets per shard are the
    # running sum in doc_id order
    from collections import defaultdict

    run = defaultdict(int)
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        assert r["seq_id"] == run[r["shard"]] // BUDGET
        assert r["seq_off"] == run[r["shard"]] % BUDGET
        run[r["shard"]] += r["n_tokens"]


def test_pack_spans_covers_every_token_exactly_once(spark, corpus):
    spans = pack_spans(corpus, BUDGET, n_shards=4).collect()
    got = {}
    for r in spans:
        assert 0 <= r["tok_start"] < r["tok_end"]
        got.setdefault(r["doc_id"], []).append(
            (r["seq_id"], r["tok_start"], r["tok_end"])
        )
    for i in range(200):
        parts = sorted(got[i])
        # spans tile [0, n_tokens) with consecutive seq ids
        assert parts[0][1] == 0
        assert parts[-1][2] == 1 + i % 40
        for (s1, _, e1), (s2, b2, _) in zip(parts, parts[1:]):
            assert s2 == s1 + 1 and b2 == e1
    # every sequence holds exactly `budget` tokens except each shard's last
    seq_tokens = {}
    shard_of = {}
    for r in spans:
        key = (r["shard"], r["seq_id"])
        seq_tokens[key] = seq_tokens.get(key, 0) + r["tok_end"] - r["tok_start"]
        shard_of[key] = r["shard"]
    last = {}
    for sh, sq in seq_tokens:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), tot in seq_tokens.items():
        if sq != last[sh]:
            assert tot == BUDGET
        else:
            assert 0 < tot <= BUDGET


def test_pack_windows_are_shard_partitioned(spark, corpus):
    plan = (
        pack_greedy(corpus, BUDGET, n_shards=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs and all(s.startswith("shard") for s in specs), plan


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a@b.co and c.d+x@e.org, ip 10.1.2.3"),
            (1, "ssn 123-45-6789 phone +1 (415) 555-0134"),
            (2, "clean text only"),
            (3, "call 415-555-0134 or 212.555.0199"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[0]["n_email"], out[0]["n_ip"]) == (2, 1)
    assert "<EMAIL>" in out[0]["text_clean"]
    assert "@" not in out[0]["text_clean"]
    assert (out[1]["n_ssn"], out[1]["n_phone"]) == (1, 1)
    assert "123-45-6789" not in out[1]["text_clean"]
    assert out[2]["text_clean"] == "clean text only"
    assert sum(out[2][c] for c in ("n_email", "n_ssn", "n_ip", "n_phone")) == 0
    assert out[3]["n_phone"] == 2
    stats = pii_stats(df).collect()[0]
    assert stats["n_docs"] == 4 and stats["docs_with_pii"] == 3
    assert stats["n_email"] == 2 and stats["n_phone"] == 3


def test_hash_sample_deterministic_and_rate(spark, corpus):
    a = sorted(r["doc_id"] for r in hash_sample(corpus, 0.5, seed=1).collect())
    b = sorted(r["doc_id"] for r in hash_sample(corpus, 0.5, seed=1).collect())
    assert a == b  # retry-stable
    c = sorted(r["doc_id"] for r in hash_sample(corpus, 0.5, seed=2).collect())
    assert a != c  # seed matters
    assert 0.3 * 200 < len(a) < 0.7 * 200  # loose Bernoulli band
    # nesting property: a rate-0.2 sample is a subset of rate-0.5
    sub = set(r["doc_id"] for r in hash_sample(corpus, 0.2, seed=1).collect())
    assert sub <= set(a)


def test_stratified_sample_respects_rates(spark, corpus):
    out = stratified_sample(
        corpus, "lang", {"en": 1.0, "es": 0.0}, default_rate=0.5, seed=3
    ).collect()
    langs = {}
    for r in out:
        langs.setdefault(r["lang"], 0)
        langs[r["lang"]] += 1
    assert langs["en"] == 50  # rate 1.0 keeps everything
    assert "es" not in langs  # rate 0.0 drops everything
    for lg in ("de", "zh"):
        assert 0 < langs.get(lg, 0) < 50


def test_take_per_stratum_exact_and_plan(spark, corpus):
    out = take_per_stratum(corpus, "lang", 7, seed=5)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 7, "es": 7, "de": 7, "zh": 7}
    # the limit must sit below the exchange (partial per-partition top-n)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    # min(n, |stratum|) when the stratum is small
    tiny = corpus.filter(F.col("doc_id") < 6)  # ≤2 docs per lang
    got = take_per_stratum(tiny, "lang", 7, seed=5).count()
    assert got == 6


def test_quantile_gate_exact_and_approx(spark, corpus):
    scored = corpus.withColumn("score", F.length("text").cast("double"))
    kept = quantile_gate(scored, "score", 0.75).collect()
    scores = sorted(r["score"] for r in scored.collect())
    i = 0.75 * (len(scores) - 1)
    lo, hi = scores[int(i)], scores[min(int(i) + 1, len(scores) - 1)]
    thresh = lo + (i - int(i)) * (hi - lo)
    assert {r["doc_id"] for r in kept} == {
        r["doc_id"] for r in scored.collect() if r["score"] >= thresh
    }
    below = quantile_gate(scored, "score", 0.75, keep="below").count()
    assert below + len(kept) == 200
    # the sketch path returns a sane (quartile-ish) subset
    approx = quantile_gate(scored, "score", 0.75, exact=False).count()
    assert 0.15 * 200 <= approx <= 0.4 * 200


def test_shuffle_shards_dense_positions(spark, corpus):
    out = shuffle_shards(corpus, 4, seed=9).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1
    # seed-reproducible
    again = shuffle_shards(corpus, 4, seed=9).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }


def test_quantile_buckets_monotone_and_balanced(spark, corpus):
    from vectordb_retrieval_spark.operators.sampling import quantile_buckets

    scored = corpus.withColumn("score", F.length("text").cast("double"))
    out = quantile_buckets(scored, "score", n_buckets=4).collect()
    assert len(out) == 200
    # bucket is monotone in score
    pairs = sorted((r["score"], r["bucket"]) for r in out)
    for (s1, b1), (s2, b2) in zip(pairs, pairs[1:]):
        assert b1 <= b2
    # every band is populated and roughly quartile-sized
    from collections import Counter

    c = Counter(r["bucket"] for r in out)
    assert set(c) == {0, 1, 2, 3}
    assert all(20 <= n <= 80 for n in c.values()), c
    # sketch path: same schema, sane bands
    approx = quantile_buckets(scored, "score", n_buckets=4, exact=False)
    assert {r["bucket"] for r in approx.collect()} <= {0, 1, 2, 3}


def test_mixture_rates_plan_and_realization(spark):
    """The planned rates must (a) saturate the binding source at 1.0,
    (b) realize the target proportions in expectation, (c) respect a
    budget cap, and (d) compose with stratified_sample."""
    from vectordb_retrieval_spark.operators.sampling import (
        mixture_rates,
        stratified_sample,
    )

    # en: 6000 docs, code: 3000, math: 1000
    rows = [
        (i, ["en"] * 6 + ["code"] * 3 + ["math"])
        for i in range(10_000)
    ]
    df = spark.createDataFrame(
        [(i, srcs[i % 10]) for i, srcs in rows], "doc_id long, src string"
    )
    targets = {"en": 0.5, "code": 0.2, "math": 0.3}
    rates = mixture_rates(df, "src", targets)
    # math is binding: avail share 10% < target 30% -> rate 1.0
    assert rates["math"] == 1.0
    # scale = 1000/0.3; want_en = 0.5*scale = 1666.7 of 6000
    assert rates["en"] == pytest.approx(1000 / 0.3 * 0.5 / 6000)
    assert rates["code"] == pytest.approx(1000 / 0.3 * 0.2 / 3000)
    # budget cap: halve the total
    capped = mixture_rates(df, "src", targets, budget=1000 / 0.3 / 2)
    for k in targets:
        assert capped[k] == pytest.approx(rates[k] / 2)
    # composition: realized counts near the plan
    got = stratified_sample(df, "src", rates, id_col="doc_id").groupBy(
        "src"
    ).count().collect()
    counts = {r["src"]: r["count"] for r in got}
    assert counts["math"] == 1000  # rate 1.0 keeps everything
    assert abs(counts["en"] - 1666) < 150
    assert abs(counts["code"] - 666) < 100
    # zero-target source is dropped
    r2 = mixture_rates(df, "src", {"en": 1.0, "code": 0.0, "math": 0.0})
    assert r2 == {"en": 1.0, "code": 0.0, "math": 0.0}


def test_write_training_shards_prunes_split_partitions(spark, tmp_path, corpus):
    """The exported layout must read back identically and a split
    filter must prune partitions at the scan (PartitionFilters, not a
    post-scan filter)."""
    from vectordb_retrieval_spark.operators.packing import (
        pack_greedy,
        write_training_shards,
    )
    from vectordb_retrieval_spark.operators.sampling import split_dataset

    sp = split_dataset(corpus, {"train": 0.8, "val": 0.2}, seed=13)
    packed = pack_greedy(sp, BUDGET, n_shards=4).join(
        sp.select("doc_id", "split"), "doc_id"
    )
    path = str(tmp_path / "shards")
    write_training_shards(packed, path)

    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(r["split"] for r in back.select("split").distinct().collect()) == {
        "train", "val"
    }
    # round-trip equality on the payload columns
    a = {(r["doc_id"], r["seq_id"], r["seq_off"]) for r in packed.collect()}
    b = {(r["doc_id"], r["seq_id"], r["seq_off"]) for r in back.collect()}
    assert a == b
    # split filter reaches the scan as a partition filter
    plan = (
        back.filter(F.col("split") == "train")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "split" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan


def test_sample_hash_coin_space_beyond_premod(spark):
    """Round-8 advisor finding: the old hash pre-reduced ids mod 1e6+3,
    perfectly correlating keep/drop across id residue classes at >=1e6
    rows.  The affine-mod-2^31-1 hash must decorrelate (a) ids in the
    same residue class mod 1e6+3 and (b) ids >= 2^31 apart (identical
    low-31-bit pattern) — distinct coins, and a 0.5-rate sample keeps
    roughly half of each class instead of all-or-none."""
    from vectordb_retrieval_spark.operators.sampling import sample_hash

    n = 1000
    classes = [
        [(7 + k * 1_000_003,) for k in range(n)],   # old premod class
        [(5 + k * (1 << 31),) for k in range(n)],   # ids 2^31 apart
    ]
    for rows in classes:
        df = spark.createDataFrame(rows, "doc_id long")
        hashes = [
            r["h"]
            for r in df.select(
                sample_hash(F.col("doc_id"), 1).alias("h")
            ).collect()
        ]
        assert len(set(hashes)) == n  # affine in each term -> injective here
        kept = hash_sample(df, 0.5, seed=1).count()
        assert 400 <= kept <= 600, kept


def test_shuffle_shards_disperse_arithmetic_ids(spark):
    """An arithmetic id progression (the common auto-increment layout)
    must spread near-uniformly across export shards — no residue-class
    clumping (round-8 advisor finding on the premod hash)."""
    n, n_shards = 8000, 16
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    counts = {
        r["shard"]: r["count"]
        for r in shuffle_shards(df, n_shards, seed=2)
        .groupBy("shard")
        .count()
        .collect()
    }
    assert len(counts) == n_shards
    lo, hi = 0.8 * n / n_shards, 1.2 * n / n_shards
    assert all(lo <= c <= hi for c in counts.values()), counts


def test_phone_scrub_skips_digit_runs(spark):
    """Boundary-anchored phone shape (round-8 advisor finding): bare
    runs of 11+ digits — numeric ids, card numbers, hash tails — must
    NOT be redacted, while real phone layouts still are."""
    df = spark.createDataFrame(
        [
            (0, "order id 12345678901234567890 done"),
            (1, "card 4111111111111111 on file"),
            (2, "sha tail a3f12345678901234 ok"),
            (3, "call 415-555-0134 now"),
            (4, "intl +14155550134 ok"),
            (5, "desk +1 (415) 555-0134"),
            (6, "dots 212.555.0199"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    for i in (0, 1, 2):
        assert out[i]["n_phone"] == 0, out[i]
        assert "<PHONE>" not in out[i]["text_clean"], out[i]
    for i in (3, 4, 5, 6):
        assert out[i]["n_phone"] == 1, out[i]
        assert "<PHONE>" in out[i]["text_clean"], out[i]


def test_bigram_logprob(spark):
    """Conditional bigram LM: repeated bigrams score higher than novel
    ones; hand-check one document against the closed form."""
    import math

    from vectordb_retrieval_spark.operators.textops import bigram_logprob

    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),   # one dominant bigram pattern
            (1, "c d e f g h"),   # all-singleton bigrams
            (2, "solo"),          # < 2 tokens -> no row
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob(df, alpha=0.5).collect()}
    assert 2 not in out
    assert out[0].n_bigrams == 5 and out[1].n_bigrams == 5
    assert out[0].logprob > out[1].logprob
    # closed form for doc 1: every bigram unique -> c2=1, c1=1, V=9
    want = round(math.log10((1 + 0.5) / (1 + 0.5 * 9)), 6)
    assert abs(out[1].logprob - want) < 1e-9


def test_sentence_bleu_matches_python_model(spark):
    """sentence_bleu vs a pure-python BLEU implementation (Lin-Och
    add-one smoothing, brevity penalty), including empty-candidate and
    no-overlap rows pinned to 0."""
    import math

    from vectordb_retrieval_spark.operators.textops import sentence_bleu

    rows = [
        (0, ["the", "cat", "sat", "on", "the", "mat"],
            ["the", "cat", "is", "on", "the", "mat"]),
        (1, ["a", "b"], ["the", "cat"]),                # no overlap -> 0
        (2, [], ["the", "cat"]),                        # empty cand -> 0
        (3, ["x", "y", "z"], ["x", "y", "z"]),          # identical -> 1
        (4, ["short"], ["a", "much", "longer", "reference", "short"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cand array<string>, ref array<string>")
    got = {r["doc_id"]: r.asDict() for r in sentence_bleu(df, "cand", "ref").collect()}

    def py_bleu(cand, ref):
        if not cand:
            return 0.0
        c1 = sum(min(cand.count(g), ref.count(g)) for g in set(cand))
        if not c1:
            return 0.0
        logs = []
        for n in range(1, 5):
            cg = [" ".join(cand[i:i+n]) for i in range(len(cand)-n+1)]
            rg = [" ".join(ref[i:i+n]) for i in range(len(ref)-n+1)]
            clip = sum(min(cg.count(g), rg.count(g)) for g in set(cg))
            sm = 0 if n == 1 else 1
            logs.append(math.log((clip+sm)/(len(cg)+sm)))
        bp = math.exp(min(0.0, 1.0 - len(ref)/len(cand)))
        return round(bp * math.exp(sum(logs)/4.0), 6)

    for did, cand, ref in rows:
        assert got[did]["bleu"] == py_bleu(cand, ref), did
    assert got[3]["bleu"] == 1.0 and got[1]["bleu"] == 0.0 == got[2]["bleu"]


def test_zipf_fit_recovers_planted_slope(spark):
    """zipf_fit on an exactly Zipfian corpus (freq(rank) = C/rank)
    recovers slope -1 with r2 ~ 1; numpy polyfit agrees."""
    import numpy as np

    from vectordb_retrieval_spark.operators.textops import zipf_fit

    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * (1200 // r)
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    row = zipf_fit(df).first()
    assert row["n_types"] == 40
    assert row["n_tokens"] == len(words)
    x = np.log(np.arange(1, 41))
    y = np.log(np.array([1200 // r for r in range(1, 41)], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["slope"] - round(float(slope), 6)) <= 1e-6
    assert abs(row["intercept"] - round(float(intercept), 6)) <= 1e-6
    assert row["r2"] > 0.999
