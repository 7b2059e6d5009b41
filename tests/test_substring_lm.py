"""Planted-data units for the round-11 additions rs1 (cross-document
repeated n-gram spans, dedup.repeated_ngram_spans) and px1 (bigram-LM
cross-entropy scoring, operators/lm.py). The full-corpus outputs are pinned
by tests/test_oracle_parity.py; these pin the operator semantics the oracle
comparison cannot isolate: span-merge arithmetic, the distinct-docs
predicate, smoothing values on hand-countable corpora, and the edge guards.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import lm
from agent_data_wrangler_spark.operators.dedup import repeated_ngram_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# repeated_ngram_spans
# ---------------------------------------------------------------------------


def test_planted_shared_run_becomes_one_span_each(spark):
    # A 7-token run shared by docs 1 and 2 inside otherwise-unique context:
    # 5-gram hits at 3 consecutive positions merge into ONE 7-token span.
    run = "r1 r2 r3 r4 r5 r6 r7"
    df = _docs(
        spark,
        [
            (1, f"a1 a2 a3 {run} a4 a5"),
            (2, f"b1 b2 {run} b3 b4 b5 b6"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in repeated_ngram_spans(df, "doc_id", "text", n=5).collect()
    }
    assert set(out) == {1, 2}
    for did in (1, 2):
        assert out[did]["n_spans"] == 1
        assert out[did]["repeated_tokens"] == 7
        assert out[did]["repeat_frac"] == round(7 / out[did]["total_tokens"], 6)
    assert out[1]["total_tokens"] == 12
    assert out[2]["total_tokens"] == 13


def test_two_disjoint_runs_stay_two_spans(spark):
    a = "x1 x2 x3 x4 x5"
    b = "y1 y2 y3 y4 y5"
    df = _docs(
        spark,
        [
            (1, f"{a} m1 m2 m3 m4 m5 m6 {b}"),  # runs separated by 6 unique tokens
            (2, f"{a} n1 n2 n3 n4 n5 n6 {b}"),
        ],
    )
    out = {r["doc_id"]: r for r in repeated_ngram_spans(df, "doc_id", "text", n=5).collect()}
    for did in (1, 2):
        assert out[did]["n_spans"] == 2
        assert out[did]["repeated_tokens"] == 10


def test_within_doc_repeat_is_not_cross_doc(spark):
    # The same 5-gram twice in ONE doc (min(id) == max(id)) must not flag.
    df = _docs(
        spark,
        [
            (1, "p1 p2 p3 p4 p5 q1 q2 q3 p1 p2 p3 p4 p5"),
            (2, "z1 z2 z3 z4 z5 z6 z7"),
        ],
    )
    assert repeated_ngram_spans(df, "doc_id", "text", n=5).count() == 0


def test_short_docs_and_min_docs_threshold(spark):
    run = "s1 s2 s3 s4 s5"
    df = _docs(
        spark,
        [
            (1, run),           # exactly n tokens: one gram
            (2, f"u1 {run}"),
            (3, f"v1 v2 {run}"),
            (4, "w1 w2 w3 w4"),  # < n tokens: excluded entirely
        ],
    )
    # min_docs=2: docs 1-3 all flagged
    assert repeated_ngram_spans(df, "doc_id", "text", n=5).count() == 3
    # min_docs=3: still all three (the run occurs in 3 distinct docs)
    assert repeated_ngram_spans(df, "doc_id", "text", n=5, min_docs=3).count() == 3
    # min_docs=4: nothing qualifies
    assert repeated_ngram_spans(df, "doc_id", "text", n=5, min_docs=4).count() == 0


def test_case_folding_matches_dedup_family(spark):
    df = _docs(spark, [(1, "A B C D E f"), (2, "a b c d e g")])
    out = repeated_ngram_spans(df, "doc_id", "text", n=5).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["repeated_tokens"] == 5 for r in out)


def test_rejects_bad_n(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        repeated_ngram_spans(df, "doc_id", "text", n=0)
    with pytest.raises(ValueError):
        # min_docs=1 would silently mean 2 under the min!=max fast path
        repeated_ngram_spans(df, "doc_id", "text", n=2, min_docs=1)


def test_rejects_zero_smoothing(spark):
    train = _docs(spark, [(1, "a b c")])
    model, ctx, vocab = lm.bigram_lm(train, "doc_id", "text")
    ev = _docs(spark, [(10, "a b")])
    with pytest.raises(ValueError):
        # k=0 sends unseen bigrams through log2(0)->NULL which avg() drops
        lm.score_bigram_xent(ev, model, ctx, vocab, "doc_id", "text", k=0.0)


# ---------------------------------------------------------------------------
# bigram LM scoring
# ---------------------------------------------------------------------------


def test_bigram_model_counts_and_xent_by_hand(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    # bigrams: (a,b)x2 + (b,a)x1 from doc1; (a,b)+(b,c) from doc2
    model, ctx, vocab = lm.bigram_lm(train, "doc_id", "text")
    m = {(r["__w1"], r["__w2"]): r["__c12"] for r in model.collect()}
    assert m == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    c = {r["__w1"]: r["__c1"] for r in ctx.collect()}
    assert c == {"a": 3, "b": 2}
    assert vocab.collect()[0]["__v"] == 3

    ev = _docs(spark, [(10, "a b"), (11, "z a")])
    out = {
        r["doc_id"]: r
        for r in lm.score_bigram_xent(
            ev, model, ctx, vocab, "doc_id", "text", round_to=6
        ).collect()
    }
    # P(b|a) = (3+0.5)/(3+0.5*3) = 3.5/4.5
    assert out[10]["n_bigrams"] == 1
    assert out[10]["xent_bits"] == round(-math.log2(3.5 / 4.5), 6)
    # unseen context z: P(a|z) = 0.5/(0.5*3) = 1/3 (uniform 1/V)
    assert out[11]["xent_bits"] == round(-math.log2(1 / 3), 6)


def test_sub_two_token_docs_are_excluded(spark):
    train = _docs(spark, [(1, "a b c")])
    model, ctx, vocab = lm.bigram_lm(train, "doc_id", "text")
    ev = _docs(spark, [(10, "solo"), (11, ""), (12, "a b")])
    out = lm.score_bigram_xent(ev, model, ctx, vocab, "doc_id", "text")
    assert [r["doc_id"] for r in out.collect()] == [12]
