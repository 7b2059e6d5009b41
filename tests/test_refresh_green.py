"""Guard: LAST_GREEN_ROUND must match the CORRECTNESS_r*.json union.

Rounds 6/7 showed a hand-maintained green map silently goes stale, wasting
the driver's 50 capped oracle slots on already-verified queries. This test
fails whenever ``python tools/refresh_green.py`` would change
``__spark_entry__.py``, making the refresh impossible to forget.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_last_green_round_is_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "refresh_green.py"),
         "--check"],
        capture_output=True, text=True)
    assert proc.returncode == 0, (
        "LAST_GREEN_ROUND is stale — run `python tools/refresh_green.py`.\n"
        + proc.stdout + proc.stderr)


def test_green_map_matches_artifacts():
    sys.path.insert(0, REPO)
    try:
        import __spark_entry__ as entry
        from tools.refresh_green import compute_green_rounds
    finally:
        sys.path.pop(0)
    assert entry.LAST_GREEN_ROUND == compute_green_rounds(REPO)


def test_slate_puts_unverified_first():
    """The first DRIVER_SLOT_CAP queries must contain every never-verified
    oracle query (after the canaries) — the whole point of the rotation."""
    sys.path.insert(0, REPO)
    try:
        import __spark_entry__ as entry
    finally:
        sys.path.pop(0)
    q = entry.queries()
    oracles = entry.oracle_sql()
    unverified = [k for k in q
                  if k in oracles and k not in entry.LAST_GREEN_ROUND]
    slate = list(q)[:entry.DRIVER_SLOT_CAP]
    missing = [k for k in unverified if k not in slate]
    assert len(unverified) <= entry.DRIVER_SLOT_CAP - len(entry.CANARIES) \
        or not missing, f"never-verified queries outside the slate: {missing}"
    assert not missing, f"never-verified queries outside the slate: {missing}"


def test_compute_green_rounds_semantics(tmp_path):
    """A green row needs rows+schema+hash ALL true; rows-only and failed
    rows never count; a later failed round does not erase an earlier green
    (the map records the most recent GREEN, and the rotation will resurface
    the query for re-verification anyway)."""
    import json

    from tools.refresh_green import compute_green_rounds

    def write(rnd, data):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(data))

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    hash_fail = dict(green, hash_match=False)
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "oracle_rows": None,
                 "err": "no_oracle"}
    write(1, {"a": green, "b": hash_fail, "c": rows_only})
    write(2, {"a": hash_fail, "b": green})

    import sys
    sys.path.insert(0, str(REPO))
    try:
        got = compute_green_rounds(str(tmp_path))
    finally:
        sys.path.pop(0)
    assert got == {"a": 1, "b": 2}
