"""String normalization scalar helpers (reference operators T7-T11, T13).

All are pure Column expressions (regexp / case / trim built-ins) — JVM-side,
codegen-friendly, no UDFs. Evidence for each lives in the reference fixtures:
mixed phone formats (dirty.csv:2-18), Y/N/Yes/No booleans (dirty.csv
"Subscribed"), literal "N/A" sentinels in numeric columns (dirty.csv:35).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_if_sentinel(col: Column | str, sentinels: tuple[str, ...] = ("N/A", "NA", "null", "")) -> Column:
    """Map literal NA-sentinel strings to null (T13) before a numeric cast.

    Mirrors pandas' default ``na_values`` behaviour that the reference relies
    on silently (dirty.csv:35 has ``N/A`` inside the numeric Salary column).
    """
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed.isin(*sentinels), F.lit(None)).otherwise(c)


def normalize_bool(col: Column | str) -> Column:
    """Normalize Y/N/Yes/No/True/False (any case, padded) to BooleanType (T9).

    The reference's "Subscribed" column carries 4 encodings of 2 values
    (FIXTURES.md fixture 1); unknown encodings become null rather than False
    so they remain visible to null-count profiling.
    """
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(F.trim(c))
    return (
        F.when(lowered.isin("y", "yes", "true", "t", "1"), F.lit(True))
        .when(lowered.isin("n", "no", "false", "f", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def normalize_phone(col: Column | str) -> Column:
    """Normalize mixed phone formats to bare digits, preserving extensions as
    ``digits x ext`` → ``digits`` + struct is overkill; the reference's cleaned
    artifacts keep a single string, so we emit ``<digits>[x<ext>]`` (T11).

    Handles the four observed formats: ``035-721-9686``, ``(673)260-2673``,
    bare ``1811968548``, ``+1-079-220-1256x89001`` (dirty.csv:18).
    """
    c = F.col(col) if isinstance(col, str) else col
    # Split off an extension marked by x/ext, strip non-digits from the body.
    body = F.regexp_extract(c, r"^([^xX]*)", 1)
    ext = F.regexp_extract(c, r"[xX](\d+)\s*$", 1)
    digits = F.regexp_replace(body, r"[^0-9]", "")
    return F.when(ext != "", F.concat(digits, F.lit("x"), ext)).otherwise(digits)


#: PII patterns shared by the redactor and the oracle SQL. Kept to syntax
#: valid in BOTH Java regex (Spark) and RE2 (DuckDB): no backrefs, no
#: lookaround. Order matters: emails first (their local parts can contain
#: digit runs a phone pattern would chew on).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "[PHONE]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
)


def redact_pii(col: Column | str) -> Column:
    """Scrub emails, phone-like digit runs, and IPv4 literals from free text,
    replacing each with a typed placeholder — the pre-training PII pass every
    public LLM-data pipeline runs (e.g. C4's and Dolma's regex scrubbers).
    Chained regexp_replace: pure codegen, scan-stage, zero Python; the same
    patterns drive the DuckDB oracle, so redaction is hash-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrence count of one PII pattern (pre-redaction audit metric)."""
    pattern = next(p for n, p, _t in PII_PATTERNS if n == kind)
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern)).cast("bigint")
