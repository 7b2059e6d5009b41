"""Pins for the driver contract (__spark_entry__): registry completeness and
the capped-slot rationing order — canaries first, then never-driver-verified
queries, then verified ones stalest-first. This ordering decides which
queries receive driver correctness rows each round; a regression here
silently starves new work of verification."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)
    assert len(q) >= 119


def test_slot_order_canaries_then_unverified_then_stalest():
    names = list(entry.queries())
    n_canary = len(entry.CANARIES)
    assert names[:n_canary] == list(entry.CANARIES)

    verified = entry.LAST_GREEN_ROUND
    rest = names[n_canary:]
    # Block 1: every never-verified query precedes every verified one.
    flags = [k in verified for k in rest]
    first_verified = flags.index(True) if True in flags else len(rest)
    assert all(flags[first_verified:]), "unverified query after verified block"
    # Block 2: verified queries are ordered stalest (lowest round) first.
    rounds = [verified[k] for k in rest[first_verified:]]
    assert rounds == sorted(rounds)


def test_new_round5_queries_claim_slots_before_verified():
    """Every round-5 addition must sit inside the driver's 50-slot window."""
    names = list(entry.queries())[:50]
    for q in ("cd1_apply_changes_orders", "n12_incremental_neardup_documents",
              "st7_stream_stream_join_events", "mx1_mixture_sample_documents",
              "lm1_ngram_coverage_documents", "pd1_python_datasource",
              "fn1_funnel_events", "rc1_retention_events"):
        assert q in names, f"{q} starved out of the 50-slot window"
