"""URL normalization and domain-level curation operators.

The first stage of every web-scale training-data pipeline (CCNet,
RefinedWeb, Gopher/MassiveWeb) is URL-keyed: normalize each record's
URL, dedup on the normalized form, and aggregate/filter by registered
domain.  No analogue exists in the reference repo; this module is part
of the beyond-reference training-data layer.

All operators are pure column expressions (regexp extraction + list
functions — Java regex kept inside the dialect DuckDB's RE2 also
accepts, same policy as operators/scrub.py), so they run JVM-side in
whole-stage codegen and an external SQL engine reproduces them exactly.

Normalization policy (documented, deterministic):
- scheme and host lowercased; a leading ``www.`` and default ports
  (``:80``, ``:443``) dropped from the host;
- path kept case-sensitive, trailing ``/`` stripped;
- query parameters: tracking params (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) and empties dropped, the rest sorted for order-independence;
- fragment always dropped.

Scale: normalization is per-row (no shuffle); ``url_dedup`` is one
map-side-combinable groupBy on the normalized URL; ``domain_stats`` is
one groupBy on the registered domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# second-level labels under which a 2-letter ccTLD hosts registrations
# (heuristic public-suffix subset; the full PSL would be a broadcast
# lookup table at production scale)
_SLD = ("co", "com", "net", "org", "gov", "ac", "edu")


def _is_tracking(p: Column) -> Column:
    return (
        p.startswith("utm_")
        | p.startswith("fbclid=")
        | p.startswith("gclid=")
        | p.startswith("ref=")
        | (p == "")
    )


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL (see module docstring for the policy)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    q = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(F.split(q, "&"), lambda p: ~_is_tracking(p))
    )
    qnorm = F.concat_ws("&", kept)
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    # scheme-less / malformed URLs would all collapse toward '://' and
    # silently dedup unrelated rows — fall back to the trimmed raw URL
    # so each unparseable row keeps its own identity
    return F.when(host == "", u).otherwise(norm)


def host_of(url: Column) -> Column:
    """Lowercased host with ``www.`` and default ports stripped."""
    host = F.lower(F.regexp_extract(F.trim(url), _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def registered_domain(url: Column) -> Column:
    """Registrable domain of the URL's host: the last two labels, or the
    last three when the host ends in ``<sld>.<2-letter-cc>`` (co.uk
    style).  Heuristic public-suffix subset — see ``_SLD``."""
    labels = F.split(host_of(url), r"\.")
    n = F.size(labels)
    last = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    take3 = (n >= 3) & (F.length(last) == 2) & second.isin(*_SLD)
    tail = F.when(take3, F.slice(labels, -3, 3)).otherwise(
        F.when(n >= 2, F.slice(labels, -2, 2)).otherwise(labels)
    )
    return F.concat_ws(".", tail)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized URL: (norm_url, keeper_id = min
    id, n_copies) — the URL-keyed first-writer-wins dedup every web
    pipeline runs before content-level dedup."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            normalize_url(F.col(url_col)).alias("norm_url"),
        )
        .groupBy("norm_url")
        .agg(F.min("id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .select("norm_url", "keeper_id", "n_copies")
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per registered domain — the aggregate behind top-domain
    inspection and domain-share caps (Gopher-style)."""
    return (
        df.select(registered_domain(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .select("domain", "n_docs")
    )


def domain_filter(
    df: DataFrame, blocklist: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.  The list is a
    literal IN-set here (fine up to ~thousands); at 100 TB the
    blocklist becomes a broadcast-joined table with the identical
    anti-join semantics."""
    if not blocklist:
        return df
    return df.filter(~registered_domain(F.col(url_col)).isin(*blocklist))


def domain_cap(
    df,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registered domain —
    the domain-share cap every web-curation recipe applies so no single
    site dominates the corpus (Gopher/MassiveWeb §A.2, RefinedWeb).
    Deterministic first-writer priority: lowest id wins within a domain.

    Scale: one row_number window partitioned by registered domain (a
    single key shuffle); domains are numerous and individually small
    after URL dedup, so the window has no hot-key problem at corpus
    scale — a pathological single-domain corpus is exactly what the cap
    exists to cut."""
    if max_per_domain < 1:
        raise ValueError(f"max_per_domain must be >= 1, got {max_per_domain}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(registered_domain(F.col(url_col)))
        .orderBy(F.col(id_col))
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_domain)
        .drop("_rk")
    )
