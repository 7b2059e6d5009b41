"""URL canonicalization + domain-level dedup primitives (SURVEY §2.7
extension): the standard pre-dedup stage of public crawl pipelines —
RefinedWeb (Penedo et al. 2023) §3.2 runs URL normalization + dedup before
any content-level dedup; Gopher (Rae et al. 2021) reports the same
domain-level quota filters. The reference never touches URLs (its largest
dataset is a 500-row HR CSV); this module exists because a 100 TB crawl
pipeline dedups by canonical URL before it ever reads a document body.

Everything is a pure Column expression (regex parse + array ops inside the
scan stage — zero Python, zero shuffle, composes with partition pruning), and
every step has an exact ANSI-SQL twin so DuckDB oracles can recompute the
canonical forms byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tracking-parameter prefixes stripped during canonicalization (the
#: RefinedWeb/common-crawl cleaning set: analytics campaign tags that vary
#: per click while identifying the same resource). Case-insensitive — real
#: crawl URLs vary param-name case ('UTM_SOURCE=x') — and value-optional,
#: so a bare 'gclid' flag is dropped too. Java regex and DuckDB's RE2 both
#: honor the inline (?i) flag, keeping the SQL twins byte-identical.
TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|gclid|fbclid|mc_eid)(=|$)"

#: Two-level public suffixes the registrable-domain cut must keep whole: a
#: host under one of these contributes THREE labels to its registrable
#: domain ("shop.example.co.uk" -> "example.co.uk"), everything else two.
#: Deliberately tiny and deterministic — a production build swaps in the full
#: Mozilla public-suffix list behind the same column signature.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = ("co.uk", "com.au", "co.jp", "org.uk")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme ('' when the value does not parse as an URL)."""
    return F.lower(F.regexp_extract(_c(col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_hostport(col: Column | str) -> Column:
    """Raw host[:port] as written (case preserved; '' on non-URLs)."""
    return F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)


def url_host(col: Column | str) -> Column:
    """Canonical host: lower-cased, default ports (:80 http / :443 https)
    stripped, leading 'www.' dropped (the RefinedWeb host-fold: www and
    apex serve the same site in the crawl's eyes)."""
    raw = F.lower(url_hostport(col))
    scheme = url_scheme(col)
    no_port = F.when(
        (scheme == "http") & raw.endswith(":80"),
        F.substring(raw, 1, F.length(raw) - 3),
    ).when(
        (scheme == "https") & raw.endswith(":443"),
        F.substring(raw, 1, F.length(raw) - 4),
    ).otherwise(raw)
    return F.regexp_replace(no_port, r"^www\.", "")


def url_path(col: Column | str) -> Column:
    """Canonical path: exactly ONE trailing slash is stripped, and an empty
    path folds to '/' — so 'http://h' and 'http://h/' canonicalize alike,
    while deeper distinct paths ('/a' vs '/a//') stay distinct."""
    raw = F.regexp_extract(_c(col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    stripped = F.when(
        (F.length(raw) > 1) & raw.endswith("/"),
        F.substring(raw, 1, F.length(raw) - 1),
    ).otherwise(raw)
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def url_query_canonical(col: Column | str) -> Column:
    """Canonical query string: parameters split on '&', tracking parameters
    (TRACKING_PARAM_RE) dropped, the rest sorted lexicographically and
    re-joined — param order never identifies a distinct resource, tracking
    params never survive. '' when nothing remains."""
    q = F.regexp_extract(_c(col), r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(col: Column | str) -> Column:
    """The full canonical form: lower(scheme) '://' canonical-host
    canonical-path ['?' canonical-query]. Fragments never survive (pure
    client-side state). NULL for values that do not parse as absolute URLs
    — callers decide whether unparseable rows quarantine or pass through."""
    scheme = url_scheme(col)
    q = url_query_canonical(col)
    base = F.concat(scheme, F.lit("://"), url_host(col), url_path(col))
    out = F.when(q == "", base).otherwise(F.concat(base, F.lit("?"), q))
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


def registrable_domain(col: Column | str) -> Column:
    """Registrable domain of the URL's canonical host: the last two labels,
    or three when the host ends in a two-level public suffix
    (TWO_LEVEL_SUFFIXES). The unit domain-level quotas/rollups key on —
    per-host grouping splits one site into subdomains, per-TLD merges the
    whole internet."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return F.when(host == "", F.lit(None).cast("string")).otherwise(
        F.when(is_two_level & (n >= 3), last3).otherwise(last2)
    )
