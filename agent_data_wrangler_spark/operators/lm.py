"""Count-based n-gram language-model scoring (SURVEY §2.7 extension): the
perplexity-style quality gate of public LLM data pipelines (CCNet, Wenzek et
al. 2020, trains a KenLM on a clean reference corpus and filters crawl text
by perplexity; Gopher/Rae et al. 2021 report the same family of filters).
This is the count-model core of that gate expressed Spark-first: exact
integer bigram/context counts + add-k smoothing, scored entirely with
built-in column expressions — no UDF, no model file, every step a partial
aggregate or an equi join.

A real deployment swaps the in-corpus reference split for a curated corpus
(e.g. wiki) and a higher-order KenLM behind the same two-frame contract
(model frame keyed by (w1, w2); context frame keyed by w1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agent_data_wrangler_spark.functions.text import tokens


def bigram_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional bigrams of the lower-cased whitespace tokens:
    ``(__id, __w1, __w2)``, one row per adjacent token pair. Documents with
    fewer than two tokens contribute nothing. The token array is bound once
    (the shingles() CSE lesson); bigrams are built by index so the pair is
    positional, not distinct-set."""
    t = df.select(
        F.col(id_col).alias("__id"), tokens(F.lower(F.col(text_col))).alias("__toks")
    ).filter(F.size("__toks") >= 2)
    return t.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.struct(
                    F.element_at("__toks", i).alias("w1"),
                    F.element_at("__toks", i + 1).alias("w2"),
                ),
            )
        ).alias("__b"),
    ).select("__id", F.col("__b.w1").alias("__w1"), F.col("__b.w2").alias("__w2"))


def bigram_lm(train: DataFrame, id_col: str, text_col: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the count model on ``train``: returns ``(model, ctx, vocab)``
    where ``model`` is ``(__w1, __w2, __c12)``, ``ctx`` is ``(__w1, __c1)``
    (bigram-context occurrence counts, i.e. sum of __c12 over __w2), and
    ``vocab`` is a 1-row frame ``(__v)`` consumed via broadcast crossJoin
    (the repo's 1-row-broadcast stat-frame pattern keeps it out of the
    driver).

    Scale: both frames are plain hash aggregates over the exploded bigram
    stream (map-side partial combine does the heavy lifting — bigram
    frequencies are Zipf, so hot pairs collapse before the shuffle). Their
    sizes are corpus-vocabulary-bounded, independent of row count.
    """
    bg = bigram_frame(train, id_col, text_col)
    model = bg.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).cast("bigint").alias("__c12"))
    ctx = model.groupBy("__w1").agg(F.sum("__c12").cast("bigint").alias("__c1"))
    toks = train.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    vocab = toks.agg(F.count_distinct("__tok").cast("bigint").alias("__v"))
    return model, ctx, vocab


def score_bigram_xent(
    eval_df: DataFrame,
    model: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """Per-document bigram cross-entropy (bits per bigram) under the add-k
    model: ``P(w2|w1) = (c12 + k) / (c1 + k*V)``; unseen contexts degrade to
    the uniform ``1/V``. Returns ``(id_col, n_bigrams, xent_bits)`` for every
    eval document with >= 2 tokens. Low bits = in-distribution prose; high
    bits = noise/outlier text — the CCNet filter statistic.

    Plan: eval bigram stream LEFT-joined to the model then the context frame
    (both vocabulary-bounded; AQE broadcasts the context frame and, for
    typical vocabularies, the model too), then one doc-keyed aggregate. The
    probability arithmetic is exact-integer-in / IEEE-double-out, so an
    ANSI-SQL oracle reproduces it bit-for-bit before the final rounding.
    """
    if k <= 0:
        # k=0 would send unseen bigrams through log2(0) -> NULL, which
        # avg() then silently DROPS — the doc's score would quietly ignore
        # exactly its most surprising bigrams. Smoothing must be positive.
        raise ValueError(f"add-k smoothing requires k > 0, got {k}")
    bg = bigram_frame(eval_df, id_col, text_col)
    # A degenerate model (empty train corpus -> __v = 0) would divide by
    # zero, log2 -> NULL, and avg() would silently return NULL xent_bits —
    # the same silent-NULL-drop class the k guard above exists to prevent.
    # raise_error keeps the check expression-side (no extra driver action on
    # the 1-row vocab frame) and fails the job loudly instead.
    v_checked = F.when(F.col("__v") > 0, F.col("__v").cast("double")).otherwise(
        F.raise_error(
            F.lit(
                "score_bigram_xent: model vocabulary is empty — the train "
                "corpus produced no tokens (bigram_lm on an empty/blank split?)"
            )
        ).cast("double")
    )
    scored = (
        bg.join(model, ["__w1", "__w2"], "left")
        .join(ctx, ["__w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__id",
            (
                -F.log2(
                    (F.coalesce(F.col("__c12"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("__c1"), F.lit(0)) + F.lit(k) * v_checked)
                )
            ).alias("__bits"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("__bits"), round_to).alias("xent_bits"),
        )
        .withColumnRenamed("__id", id_col)
    )
