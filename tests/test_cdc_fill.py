"""Unit pins for the round-5 incremental operators: CDC MERGE
(operators/cdc.py), SCD Type-2 intervals, forward/backward gap fill
(operators/impute.py), and batch-vs-corpus incremental near-dup
(operators/dedup.py:near_dup_pairs_incremental)."""

from __future__ import annotations

from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import cdc, dedup, impute


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double",
    )


def _changes(spark):
    # key 1: two updates, seq 2 must win; key 2: delete; key 5: insert;
    # key 3: delete then re-insert at a later seq (resurrection) — the
    # net-effect rule keeps the seq-3 insert.
    return spark.createDataFrame(
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a2", 12.0, "U", 2),
            (2, "b", 20.0, "D", 1),
            (5, "e", 50.0, "I", 1),
            (3, "c", 30.0, "D", 2),
            (3, "c2", 33.0, "I", 3),
        ],
        "k int, name string, v double, op string, seq int",
    )


def test_apply_changes_net_effect(spark):
    out = cdc.apply_changes(
        _base(spark), _changes(spark), "k", seq_col="seq", op_col="op"
    )
    rows = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert rows == {
        1: ("a2", 12.0),   # later update wins
        3: ("c2", 33.0),   # delete-then-insert resurrects
        4: ("d", 40.0),    # untouched passes through
        5: ("e", 50.0),    # insert lands
    }
    assert out.columns == ["k", "name", "v"]


def test_apply_changes_delete_wins_when_latest(spark):
    changes = spark.createDataFrame(
        [(1, "a9", 99.0, "U", 1), (1, "a9", 99.0, "D", 2)],
        "k int, name string, v double, op string, seq int",
    )
    out = cdc.apply_changes(_base(spark), changes, "k", seq_col="seq", op_col="op")
    assert sorted(r["k"] for r in out.collect()) == [2, 3, 4]


def test_latest_changes_tie_break_deterministic(spark):
    changes = spark.createDataFrame(
        [(1, "x", 1.0, "U", 1), (1, "y", 2.0, "U", 1)],
        "k int, name string, v double, op string, seq int",
    )
    out = cdc.latest_changes(changes, "k", "seq", tie_break=["name"])
    assert out.collect()[0]["name"] == "y"  # descending tie-break


def test_scd2_history_intervals(spark):
    hist = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, 11.0), (1, 2, 12.0), (2, 0, 20.0)],
        "k int, seq int, v double",
    )
    out = cdc.scd2_history(hist, "k", "seq")
    rows = {(r["k"], r["seq"]): (r["effective_to"], r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, 0): (1, False),
        (1, 1): (2, False),
        (1, 2): (None, True),
        (2, 0): (None, True),
    }


def test_forward_fill_and_leading_nulls(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 5.0), ("u", 3, None), ("u", 4, None),
         ("u", 5, 7.0), ("w", 1, None)],
        "g string, i int, v double",
    )
    out = impute.forward_fill(df, ["v"], partition_by=["g"], order_by=["i"])
    got = {(r["g"], r["i"]): r["v"] for r in out.collect()}
    assert got == {("u", 1): None, ("u", 2): 5.0, ("u", 3): 5.0,
                   ("u", 4): 5.0, ("u", 5): 7.0, ("w", 1): None}


def test_backward_fill(spark):
    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 5.0), ("u", 3, None)],
        "g string, i int, v double",
    )
    out = impute.backward_fill(df, ["v"], partition_by=["g"], order_by=["i"])
    got = {r["i"]: r["v"] for r in out.collect()}
    assert got == {1: 5.0, 2: 5.0, 3: None}  # trailing gap stays open


_DOC = ("spark shuffle partition broadcast join aggregate window "
        "catalyst tungsten codegen arrow pandas stream watermark state")


def test_incremental_neardup_finds_cross_pair_only(spark):
    # corpus: two near-identical docs (a corpus-internal near-dup pair that
    # must NOT be emitted) + one planted near-dup of the batch doc.
    corpus = spark.createDataFrame(
        [(10, _DOC + " epsilon"), (11, _DOC + " zeta"), (12, "totally unrelated words here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, _DOC + " eta"), (101, "other completely different content")],
        "doc_id long, text string",
    )
    pairs = dedup.near_dup_pairs_incremental(
        corpus, batch, "doc_id", "text", k=3, threshold=0.5
    ).collect()
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs}
    assert (100, 10) in got and (100, 11) in got
    assert all(b == 100 for b, _ in got)  # batch side only ever batch ids
    assert all(c in (10, 11) for _, c in got)
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_incremental_matches_exact_cross_jaccard(spark):
    """The incremental funnel's output equals the exact cross-frame Jaccard
    pairs on a corpus where banding recall is ~1 (near-identical docs)."""
    docs = [(i, _DOC + f" tail{i % 2}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    batch = df.filter(F.col("doc_id") % 5 == 0)
    corpus = df.filter(F.col("doc_id") % 5 != 0)
    inc = dedup.near_dup_pairs_incremental(
        corpus, batch, "doc_id", "text", k=3, threshold=0.7
    )
    exact = (
        dedup.near_dup_pairs_exact(df, "doc_id", "text", k=3, threshold=0.7)
        .filter((F.col("id_a") % 5 == 0) != (F.col("id_b") % 5 == 0))
    )
    got = {(min(r["batch_id"], r["corpus_id"]), max(r["batch_id"], r["corpus_id"]))
           for r in inc.collect()}
    want = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert got == want and len(want) > 0
