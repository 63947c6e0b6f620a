"""Unit tests for URL normalization / domain curation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_retrieval_spark.operators.urlops import (
    domain_filter,
    domain_stats,
    host_of,
    normalize_url,
    registered_domain,
    url_dedup,
)

CASES = [
    # (raw, normalized, host, registered_domain)
    (
        "HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
        "https://news.example.com/a/b?a=1&b=2",
        "news.example.com",
        "example.com",
    ),
    (
        "http://example.co.uk:80/path",
        "http://example.co.uk/path",
        "example.co.uk",
        "example.co.uk",
    ),
    (
        "http://sub.shop.example.org/x?fbclid=abc&gclid=1&ref=tw",
        "http://sub.shop.example.org/x",
        "sub.shop.example.org",
        "example.org",
    ),
    # non-default port kept; query order normalized
    (
        "https://Example.com:8443/?z=1&a=2",
        "https://example.com:8443?a=2&z=1",
        "example.com:8443",
        "example.com:8443",  # non-default port stays part of the last label
    ),
    ("https://localhost/", "https://localhost", "localhost", "localhost"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, *_) in enumerate(CASES)],
        schema="doc_id long, url string",
    )


def test_normalize_url_policy(url_df):
    got = url_df.select("doc_id", normalize_url(F.col("url")).alias("n")).collect()
    for r in got:
        assert r.n == CASES[r.doc_id][1], CASES[r.doc_id][0]


def test_host_of(url_df):
    got = url_df.select("doc_id", host_of(F.col("url")).alias("h")).collect()
    for r in got:
        assert r.h == CASES[r.doc_id][2]


def test_registered_domain(url_df):
    got = url_df.select(
        "doc_id", registered_domain(F.col("url")).alias("d")
    ).collect()
    for r in got:
        assert r.d == CASES[r.doc_id][3]


def test_url_dedup_first_writer_wins(spark):
    df = spark.createDataFrame(
        [
            (5, "http://a.com/x?utm_source=1"),
            (3, "HTTP://A.com/x/"),
            (9, "http://www.a.com/x"),
            (1, "http://b.com/y"),
        ],
        schema="doc_id long, url string",
    )
    rows = {r.norm_url: r for r in url_dedup(df).collect()}
    assert rows["http://a.com/x"].keeper_id == 3
    assert rows["http://a.com/x"].n_copies == 3
    assert rows["http://b.com/y"].n_copies == 1


def test_domain_stats_and_filter(spark):
    df = spark.createDataFrame(
        [
            (0, "http://x.spam.com/a"),
            (1, "http://www.spam.com/b"),
            (2, "http://ok.org/c"),
        ],
        schema="doc_id long, url string",
    )
    stats = {r.domain: r.n_docs for r in domain_stats(df).collect()}
    assert stats == {"spam.com": 2, "ok.org": 1}
    kept = domain_filter(df, ["spam.com"]).collect()
    assert [r.doc_id for r in kept] == [2]
    assert domain_filter(df, []).count() == 3


def test_normalize_url_unparseable_fallback(spark):
    """Scheme-less / malformed URLs keep their own identity (trimmed raw
    form) instead of collapsing toward '://' and cross-deduping."""
    df = spark.createDataFrame(
        [
            (0, "example.com/no-scheme"),
            (1, "not a url at all"),
            (2, "  ftp-ish//broken  "),
            (3, "http://real.com/x"),
        ],
        schema="doc_id long, url string",
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    assert got[0] == "example.com/no-scheme"
    assert got[1] == "not a url at all"
    assert got[2] == "ftp-ish//broken"
    assert got[3] == "http://real.com/x"
    # the three unparseable rows survive url_dedup as three rows
    assert url_dedup(df).count() == 4
