"""Text-analysis scalar helpers for the training-data-pipeline tier
(SURVEY §2.7): token counting, quality scoring, language-ID heuristic, and
document fingerprinting. All pure Column expressions — at 100 TB of documents
these run inside the parquet scan stage with zero shuffle and zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
#: Deliberately small and deterministic — a real deployment would swap in a
#: fastText-style model behind the same column signature.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "las", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (str.split() semantics); empty → empty array.

    Edge stripping is regex-based: ``F.trim`` removes ONLY ASCII spaces, so a
    leading tab would otherwise produce a phantom empty first token
    (hypothesis-found edge, tests/test_property_parity.py)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the "token counting" text-analysis op)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-flavoured proxy: count word pieces + standalone punctuation via a
    regex split (words, numbers, and each punctuation mark count separately).
    Deterministic and SQL-expressible; a real tokenizer would be a pandas_udf
    with the same signature."""
    c = F.col(col) if isinstance(col, str) else col
    # Remove everything that is not a token boundary, then count matches of
    # word-ish runs and punctuation marks.
    words = F.size(F.filter(F.split(c, r"[^A-Za-z0-9]+"), lambda x: x != ""))
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (words + punct).cast("bigint")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct.cast("double") / F.nullif(F.length(c).cast("double"), F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    # Token array bound once (Catalyst does not CSE the tokens() tree across
    # the hits and size references — same pattern as dedup.shingles).
    def ratio(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
        return hits.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))

    return F.element_at(
        F.transform(F.array(tokens(F.lower(F.col(col) if isinstance(col, str) else col))), ratio), 1
    )


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: length sweet-spot, low punctuation
    noise, presence of stopwords (prose-ness). Mirrors the heuristic filters
    used by public LLM-data pipelines (C4/Gopher-style rules)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    length_component = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_component = F.least(stopword_ratio(c) * 5.0, F.lit(1.0))
    score = (length_component + punct_component + stop_component) / F.lit(3.0)
    return F.round(score, 6)


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language-ID heuristic over {en,es,de,fr}, 'und' if no
    marker hits. Ties break by language code ascending (deterministic).

    Both the token array and the per-language hit-count array are bound once
    to lambda variables: the previous greatest/when-chain form embedded every
    language's filter tree into every comparison (no CSE inside expression
    trees), re-tokenizing each row ~20×.
    """
    c = F.col(col) if isinstance(col, str) else col

    def pick(toks: Column) -> Column:
        # Factory, not default-arg capture: PySpark counts default-arg params
        # as lambda arity, so ``lambda t, m=markers`` would bind m to the
        # array index.
        def _hits(markers: tuple[str, ...]) -> Column:
            return F.size(F.filter(toks, lambda t: t.isin(*markers)))

        scores = F.array(
            *[
                F.struct(_hits(markers).alias("h"), F.lit(code).alias("c"))
                for code, markers in sorted(LANG_MARKERS.items())
            ]
        )

        def choose(arr: Column) -> Column:
            best = F.array_max(F.transform(arr, lambda x: x["h"]))
            # filter preserves array order; scores are in ascending code
            # order, so the first max-hit entry is the tie-break winner.
            first = F.element_at(F.filter(arr, lambda x: x["h"] == best), 1)
            return F.when(best > 0, first["c"]).otherwise(F.lit("und"))

        return F.element_at(F.transform(F.array(scores), choose), 1)

    return F.element_at(F.transform(F.array(tokens(F.lower(c))), pick), 1)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of case-folded,
    whitespace-collapsed, edge-trimmed text. Used for exact near-normalized
    dedup; md5 keeps oracle parity (DuckDB md5 produces identical hex).

    Collapse happens BEFORE the trim so non-space whitespace at the edges
    (tabs, newlines) normalizes identically to spaces — trim-first left
    ``"\\ta"`` and ``" a"`` with different fingerprints (hypothesis-found)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def mean_token_len(col: Column | str) -> Column:
    """Average token length (Gopher-style quality signal: real prose sits in
    ~3-10 chars; extremes flag boilerplate or garbage)."""

    def avg_len(toks: Column) -> Column:
        total = F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        )
        return total.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))

    return F.element_at(F.transform(F.array(tokens(col)), avg_len), 1)


def dup_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (1 - distinct/total; 0 when fewer than one n-gram) — the Gopher
    "duplicate n-gram fraction" boilerplate detector. Pure Column fold:
    runs inside the scan stage."""

    def frac(toks: Column) -> Column:
        m = F.size(toks) - F.lit(n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        total = m.cast("double")
        uniq = F.size(F.array_distinct(grams)).cast("double")
        return F.when(m <= 0, F.lit(0.0)).otherwise(
            F.round(F.lit(1.0) - uniq / total, 6)
        )

    return F.element_at(F.transform(F.array(tokens(F.lower(col if isinstance(col, Column) else F.col(col)))), frac), 1)


def top_token_fraction(col: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent token (Gopher's
    "top word" concentration signal; high values flag keyword-stuffed or
    templated text). O(unique x tokens) per row as a Column fold — fine for
    natural-language token counts; all inside the scan stage."""

    def frac(toks: Column) -> Column:
        counts = F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda t: t == u)),
        )
        return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
            F.round(
                F.array_max(counts).cast("double") / F.size(toks).cast("double"), 6
            )
        )

    return F.element_at(F.transform(F.array(tokens(F.lower(col if isinstance(col, Column) else F.col(col)))), frac), 1)


def winnow_fingerprints(col: Column | str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash every
    k-token gram, slide a w-hash window, keep each window's minimum —
    guaranteed to share fingerprints with any document overlapping by
    >= w+k-1 tokens. Returns the DISTINCT selected hashes (array<string>).

    The gram hash is an md5-hex prefix rather than a Rabin-Karp rolling hash:
    winnowing's semantics only need a uniform hash with a total order
    (lexicographic on fixed-width hex == numeric), and md5 is reproducible in
    DuckDB for the oracle; a production build would swap in a cheaper rolling
    hash behind the same signature. Pure Column fold — scan-stage only."""

    def fps(toks: Column) -> Column:
        m = F.size(toks) - F.lit(k - 1)  # number of k-grams
        hashes = F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 8),
        )

        def windows(hs: Column) -> Column:
            nw = F.size(hs) - F.lit(w - 1)
            mins = F.transform(
                F.sequence(F.lit(1), F.greatest(nw, F.lit(1))),
                lambda i: F.array_min(F.slice(hs, i, w)),
            )
            # fewer hashes than one window: keep the global min (standard
            # winnowing boundary rule for short docs)
            return F.when(F.size(hs) == 0, F.array().cast("array<string>")).otherwise(
                F.when(nw <= 0, F.array(F.array_min(hs))).otherwise(
                    F.array_distinct(mins)
                )
            )

        return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
            F.element_at(F.transform(F.array(hashes), windows), 1)
        )

    return F.element_at(F.transform(F.array(tokens(F.lower(col if isinstance(col, Column) else F.col(col)))), fps), 1)
