"""Bounded-memory sketch operators with exact-verify second passes.

The 100 TB pattern both operators share: a single streaming pass with O(k)
state per task produces a SMALL candidate set with a superset guarantee,
then an exact JVM-side pass over only the candidates decides the final
answer. The sketch stage bounds memory no matter the key cardinality; the
verify stage makes the result exact and partitioning-independent — so the
queries built on these register PLAIN exact SQL oracles, not verdict
booleans (the sketch provably cannot change the answer, only the cost).

Reference scope note: the reference engine (tool_call_agent.py) has no
sketching surface; this module belongs to the north-star training-data tier
(SURVEY §2.7) — stopword/boilerplate discovery over web corpora is the
canonical use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agent_data_wrangler_spark.functions.text import tokens


def misra_gries_candidates(
    df: DataFrame, text_col: str, *, k: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries token summaries: ``(token, est_count)``.

    One streaming pass per task, at most ``k`` counters of state, tokenizing
    in pandas with the same str.split() semantics as functions/text.tokens
    (lower-cased, whitespace-split, edge-stripped). Batches merge via the
    mergeable-summaries rule (Agarwal et al.): combine counts, then subtract
    the (k+1)-th largest count from all and drop the non-positive — the
    per-partition undercount is <= n_p/(k+1), so any token with GLOBAL count
    > N/k keeps a positive counter in at least one partition summary. The
    union of partition summaries is therefore a SUPERSET of the true
    heavy-hitter set — the guarantee heavy_hitters()'s exact verify relies
    on. est_count is a lower bound, for diagnostics only.
    """

    # ASCII whitespace ONLY, mirroring functions/text.tokens (Java regex \s)
    # and the DuckDB oracle (RE2 \s): pandas str.split() and Python re's \s
    # both split on UNICODE whitespace (U+00A0 etc.), which would fracture a
    # heavy token containing one into pieces the exact verify never counts —
    # silently breaking the candidate-superset guarantee. (Pinned by the
    # U+00A0 case in tests/test_dedup_similarity.py.)
    ascii_ws = "[ \t\n\x0b\f\r]"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for batch in batches:
            stripped = (
                batch[text_col]
                .dropna()
                .str.lower()
                .str.replace(f"^{ascii_ws}+|{ascii_ws}+$", "", regex=True)
            )
            toks = (
                stripped[stripped != ""]
                .str.split(f"{ascii_ws}+", regex=True)
                .explode()
            )
            for tok, cnt in toks.value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - m for t, c in counters.items() if c - m > 0
                }
        yield pd.DataFrame(
            {"token": list(counters), "est_count": list(counters.values())}
        )

    return df.select(text_col).mapInPandas(
        summarize, schema="token string, est_count long"
    )


def heavy_hitters(df: DataFrame, text_col: str, *, k: int = 64) -> DataFrame:
    """Exact corpus heavy hitters (tokens with count*k > total tokens) found
    via sketch-then-verify: MG candidates bound the state, then an exact
    JVM-side count over ONLY the candidate tokens decides membership. The
    result is exact and independent of partitioning/batch order — identical
    to the naive full GROUP BY HAVING, at a fraction of its shuffle (the
    exchange carries candidate tokens only, never the full vocabulary).

    Output: ``(token, cnt)`` — integer comparisons only, oracle-matchable.
    """
    candidates = (
        misra_gries_candidates(df, text_col, k=k)
        .select("token")
        .distinct()
    )
    tok = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    # Total token count WITHOUT an explode (sum of per-row token-array sizes
    # inside the scan stage): the naive tok.count() would be a third full
    # tokenize-and-explode pass over the corpus just for one scalar.
    total = df.agg(
        F.sum(F.size(tokens(F.lower(F.col(text_col))))).alias("__n")
    )
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .select("token", "cnt")
    )
