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


def test_slot_window_holds_unverified_and_stalest():
    """The driver's 50-slot window must contain (a) every never-verified
    oracle query — new work gets driver rows before anything re-verifies —
    and (b) after that, the least-recently-verified queries, so the whole
    registry keeps cycling through the driver (round-4/5 lessons)."""
    names = list(entry.queries())
    window = set(names[:50])
    unverified = [k for k in names if k not in entry.LAST_GREEN_ROUND]
    assert len(unverified) <= 50 - len(entry.CANARIES), (
        "more new queries than slots — raise the cap discussion in NOTES")
    for q in unverified:
        assert q in window, f"never-verified {q} starved out of the window"
    # the window's verified block must be a prefix of the stalest ordering
    verified_in = [k for k in names[:50]
                   if k in entry.LAST_GREEN_ROUND and k not in entry.CANARIES]
    verified_all = [k for k in names
                    if k in entry.LAST_GREEN_ROUND and k not in entry.CANARIES]
    assert verified_in == verified_all[:len(verified_in)]
