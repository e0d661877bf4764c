"""Web-corpus hygiene operators for training-data pipelines: URL
canonicalization, PII redaction, and repetition-based quality signals.

All JVM-native Column expressions (regexp/split/sort — codegen'd, no
Python), with DuckDB-expressible semantics so each gets an oracle twin in
queries.py. Patterns are written to the common subset of Java regex and
RE2 (no backrefs, no lookaround) so both engines match identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params that carry tracking state, not content identity — dropping
# them is the single highest-value dedup move on crawled URLs
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL for identity/dedup:

    * scheme + host lowercased, the scheme's DEFAULT port dropped
      (:80 for http, :443 for https — never cross-scheme, r2 review)
    * fragment dropped FIRST (a '?' inside a fragment must not resurrect
      as a query string, r2 review)
    * tracking params (utm_*, fbclid, gclid, ...) dropped
    * remaining query params sorted bytewise
    * trailing slash stripped from the path

    Malformed inputs (no scheme://host) pass through lowercased+trimmed, so
    the expression never NULLs a whole row.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(F.trim(u), r"#.*$", "")  # fragment dies first
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(F.lower(u))


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(text: Column | str) -> Column:
    """Replace emails / NNN-NNN-NNNN phones / IPv4 literals with typed
    placeholder tokens. Order matters: emails first (their local part can
    contain digits that would otherwise half-match the phone pattern);
    IPv4 last (phone redaction can't produce dotted quads)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PII_PHONE_RE, "<PHONE>")
    t = F.regexp_replace(t, PII_IPV4_RE, "<IP>")
    return t


def pii_counts(text: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in the raw text — the audit
    counterpart of redact_pii (count BEFORE redaction)."""
    t = F.col(text) if isinstance(text, str) else text
    return (
        F.regexp_count(t, F.lit(PII_EMAIL_RE)),
        F.regexp_count(t, F.lit(PII_PHONE_RE)),
        F.regexp_count(t, F.lit(PII_IPV4_RE)),
    )


def repetition_stats(
    docs: DataFrame, id_col: str, tokens_col: str
) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1):

      distinct_ratio    = |distinct tokens| / |tokens|
      top_bigram_frac   = occurrences of the most frequent bigram / #bigrams

    Heavily-templated/spammy docs score low distinct_ratio and high
    top_bigram_frac. Relational formulation: one explode + two aggs, all
    codegen'd; scales as a groupBy on doc_id (no skew — keys are doc ids).
    Docs with <2 tokens get top_bigram_frac 0.
    """
    toks = F.col(tokens_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("distinct_ratio"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    frac = counts.groupBy("doc_id").agg(
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias(
            "top_bigram_frac"
        )
    )
    return base.select("doc_id", "distinct_ratio").join(
        frac, "doc_id", "left"
    ).select(
        "doc_id",
        "distinct_ratio",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# URL-based document filtering — the RefinedWeb §3.1 "URL filtering" stage
# (Penedo et al. 2023; public method): a crawl drops documents by their
# URL alone, BEFORE fetching/extracting costs anything — a domain
# blocklist plus a soft banned-word score over the URL string. All native
# string expressions (codegen'd); lists are tiny literals broadcast by
# value.
# ---------------------------------------------------------------------------

#: default soft-score fragments — stand-ins for the (much longer) curated
#: lists production crawls maintain; the OPERATOR is the deliverable, the
#: lists are config
DEFAULT_URL_BANNED_WORDS = ("casino", "porn", "viagra", "warez", "xxx")


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL; scheme optional (crawl frontiers carry
    both forms). Empty string when nothing host-shaped is found.

    Blocklist-hardened (r7 review find): userinfo is stripped (WHATWG —
    everything up to the LAST '@' of the authority; `https://x@evil.test/`
    must not read host `x@evil.test`, nor `user:pass@evil.test` read
    `user`), the port is dropped, and trailing dots are removed (the FQDN
    form `evil.test.` is the same host). Without these, a crawl frontier
    bypasses the domain blocklist with standard URL tricks."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    no_scheme = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    auth = F.regexp_extract(no_scheme, r"^([^/?#]+)", 1)
    no_user = F.regexp_replace(auth, r"^.*@", "")
    host = F.regexp_extract(no_user, r"^([^:]*)", 1)
    return F.regexp_replace(host, r"\.+$", "")


def url_filter(
    docs: DataFrame,
    url_col: str = "url",
    blocked_domains: tuple[str, ...] = (),
    banned_words: tuple[str, ...] = DEFAULT_URL_BANNED_WORDS,
    max_hits: int = 0,
) -> DataFrame:
    """Adds (host, blocked, n_word_hits, keep) to `docs`:

    * blocked — host equals a blocklist domain OR is a subdomain of one
      (``ads.example.com`` matches blocklist entry ``example.com``);
    * n_word_hits — how many banned words occur as substrings of the
      whole lowercased URL (the RefinedWeb soft score, unweighted);
    * keep — not blocked and n_word_hits ≤ max_hits.

    Filtering decisions stay IN the row (audit-table convention — the
    caller filters on `keep`), and every row survives: a NULL url keeps
    host='' / blocked=false / hits=0, because URL filtering is advisory
    hygiene, not a correctness gate."""
    u = F.lower(F.trim(F.coalesce(F.col(url_col), F.lit(""))))
    host = url_host(u)
    blocked = F.lit(False)
    for d in blocked_domains:
        dl = d.lower()
        blocked = blocked | (host == dl) | host.endswith("." + dl)
    hits = F.lit(0)
    for w in banned_words:
        hits = hits + F.when(u.contains(w.lower()), 1).otherwise(0)
    return (
        docs.withColumn("host", host)
        .withColumn("blocked", blocked)
        .withColumn("n_word_hits", hits.cast("int"))
        .withColumn(
            "keep",
            ~F.col("blocked") & (F.col("n_word_hits") <= F.lit(max_hits)),
        )
    )
