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
    """fresh, or tolerated (one all-green driver artifact not yet folded —
    the state the driver creates by dropping CORRECTNESS after the round's
    final commit); anything else is stale and fails."""
    sys.path.insert(0, REPO)
    try:
        import __spark_entry__ as entry
        from tools.refresh_green import map_status
    finally:
        sys.path.pop(0)
    assert map_status(entry.LAST_GREEN_ROUND, REPO) in ("fresh", "tolerated")


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


def test_map_status_tolerates_one_all_green_artifact(tmp_path):
    """The driver drops CORRECTNESS_r{N}.json AFTER the round's last commit,
    so at judge time the committed map is one artifact behind. map_status
    accepts exactly that state — one unfolded newest file, every row green —
    and nothing looser."""
    import json

    from tools.refresh_green import compute_green_rounds, map_status

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red = dict(green, hash_match=False)

    def write(rnd, data):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(data))

    write(1, {"a": green, "b": green})
    folded = compute_green_rounds(str(tmp_path))   # map as of r01

    # Fully folded map is fresh.
    assert map_status(folded, str(tmp_path)) == "fresh"

    # One newer all-green artifact the map hasn't folded: tolerated.
    write(2, {"a": green, "c": green})
    assert map_status(folded, str(tmp_path)) == "tolerated"

    # The folded-up-to-date map is of course fresh again.
    assert map_status(compute_green_rounds(str(tmp_path)),
                      str(tmp_path)) == "fresh"

    # A red row in the newest artifact: NOT tolerated.
    write(2, {"a": green, "c": red})
    assert map_status(folded, str(tmp_path)) == "stale"

    # Two unfolded artifacts (even if both all-green): NOT tolerated.
    write(2, {"a": green, "c": green})
    write(3, {"d": green})
    assert map_status(folded, str(tmp_path)) == "stale"

    # A hand-mangled map (extra entry) is stale in any state.
    assert map_status(dict(folded, zz=9), str(tmp_path)) == "stale"


def test_check_mode_tolerates_driver_drop(tmp_path):
    """End-to-end: --check exits 0 when the committed entry file is exactly
    one all-green artifact behind, 1 when the newest artifact has a red row.
    refresh_green.py resolves its repo root from its own path, so a copy
    under tmp_path/tools operates on the synthetic repo."""
    import json
    import shutil
    import subprocess

    repo = tmp_path
    (repo / "tools").mkdir()
    shutil.copy(os.path.join(REPO, "tools", "refresh_green.py"),
                repo / "tools" / "refresh_green.py")

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    (repo / "CORRECTNESS_r01.json").write_text(json.dumps({"a": green}))
    (repo / "__spark_entry__.py").write_text(
        "# BEGIN LAST_GREEN_ROUND (generated by tools/refresh_green.py)\n"
        "# END LAST_GREEN_ROUND\n")

    def check():
        return subprocess.run(
            [sys.executable, str(repo / "tools" / "refresh_green.py"),
             "--check"], capture_output=True, text=True).returncode

    # Fold r01, then drop an all-green r02 the map hasn't seen: exit 0.
    subprocess.run([sys.executable,
                    str(repo / "tools" / "refresh_green.py")], check=True)
    (repo / "CORRECTNESS_r02.json").write_text(
        json.dumps({"a": green, "b": green}))
    assert check() == 0

    # Same drop with a red row: exit 1.
    red = dict(green, hash_match=False)
    (repo / "CORRECTNESS_r02.json").write_text(
        json.dumps({"a": green, "b": red}))
    assert check() == 1

    # Two unfolded all-green artifacts: exit 1.
    (repo / "CORRECTNESS_r02.json").write_text(json.dumps({"b": green}))
    (repo / "CORRECTNESS_r03.json").write_text(json.dumps({"c": green}))
    assert check() == 1
