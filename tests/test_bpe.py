"""Distributed BPE induction pinned against a pure-python reference."""

from __future__ import annotations

from collections import Counter

import pytest

from vectordb_retrieval_spark.operators.bpe import (
    _EOW,
    bpe_segment,
    bpe_train,
    word_counts,
)


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE (Sennrich et al. 2016 fig. 1 semantics, ties by
    lexicographic (a, b))."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [_EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic pick: max count, then lexicographically smallest
        top = max(pairs.values())
        if top < 2:
            break
        a, b = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append((a, b))
        new_vocab: Counter = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    return merges


_TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest low newer",
]


@pytest.fixture(scope="module")
def corpus_bpe(spark):
    return spark.createDataFrame(
        list(enumerate(_TEXTS)), schema="doc_id long, text string"
    )


def test_bpe_train_matches_python_reference(spark, corpus_bpe):
    got = bpe_train(corpus_bpe, n_merges=12)
    want = _py_bpe(_TEXTS, 12)
    assert got == want
    assert len(got) >= 5  # the corpus supports a real merge sequence


def test_word_counts(spark, corpus_bpe):
    wc = {r.word: r["count"] for r in word_counts(corpus_bpe).collect()}
    assert wc["low"] == 4 and wc["newer"] == 3 and wc["widest"] == 1


def test_bpe_segment_accounting(spark, corpus_bpe):
    merges = bpe_train(corpus_bpe, n_merges=12)
    seg = {r.id: r for r in bpe_segment(corpus_bpe, merges).collect()}
    for i, t in enumerate(_TEXTS):
        assert seg[i].n_words == len(t.split())
        # BPE token count per word lies in [1, len(word)+1]
        lo = seg[i].n_words
        hi = sum(len(w) + 1 for w in t.split())
        assert lo <= seg[i].n_bpe_tokens <= hi
    # with zero merges, every word costs len(word)+1 symbols
    seg0 = {r.id: r for r in bpe_segment(corpus_bpe, []).collect()}
    for i, t in enumerate(_TEXTS):
        assert seg0[i].n_bpe_tokens == sum(len(w) + 1 for w in t.split())
    # more merges never increase the token count
    seg_half = {
        r.id: r for r in bpe_segment(corpus_bpe, merges[:3]).collect()
    }
    for i in seg:
        assert seg[i].n_bpe_tokens <= seg_half[i].n_bpe_tokens


def test_bpe_driver_and_distributed_loops_identical(spark, corpus_bpe):
    """The default driver-side incremental merge loop and the
    distributed per-merge loop are merge-for-merge identical."""
    fast = bpe_train(corpus_bpe, n_merges=12)
    slow = bpe_train(corpus_bpe, n_merges=12, driver_vocab_limit=0)
    assert fast == slow == _py_bpe(_TEXTS, 12)


def test_driver_merge_loop_incremental_stats():
    """The incremental pair-statistics loop matches the naive recount
    reference on a larger synthetic vocabulary, at speed (1k merges in
    seconds, not minutes)."""
    import random
    import time

    from vectordb_retrieval_spark.operators.bpe import _driver_merge_loop

    rng = random.Random(11)
    alphabet = "abcdefgh"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 9)))
            for _ in range(30)
        )
        for _ in range(300)
    ]
    vocab = Counter(w for t in texts for w in t.split())
    words = [(list(w) + [_EOW], c) for w, c in vocab.items()]
    t0 = time.time()
    got = _driver_merge_loop([(list(s), c) for s, c in words], 200)
    dt = time.time() - t0
    want = _py_bpe(texts, 200)
    assert got == want
    assert dt < 30, dt


def test_batched_distributed_loop_parity_stress(spark):
    """The batched distributed rounds (parity-prefix selection) must be
    merge-for-merge identical to the driver loop on a corpus built to
    stress every break rule: a tiny alphabet (constant symbol sharing),
    heavy count ties, repeated symbols inside words, and merges whose
    concatenation equals an existing symbol ('ab' appears both as a
    character pair and inside longer runs)."""
    import random

    rng = random.Random(11)
    words = []
    for _ in range(300):
        words.append("".join(rng.choice("ab") for _ in range(rng.randint(1, 8))))
    for _ in range(200):
        words.append("".join(rng.choice("abc") for _ in range(rng.randint(2, 10))))
    words += ["abab", "aabb", "abba", "ab", "ba"] * 30
    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    want = bpe_train(df, n_merges=80)  # driver loop
    got = bpe_train(df, n_merges=80, driver_vocab_limit=0)  # batched rounds
    assert got == want
    assert len(got) >= 40  # the corpus supports a deep merge sequence
