"""Per-query bench regression gate (r08 verdict item 6).

Compares the most recent local bench capture (``BENCH_local_latest.json``,
written by every ``python bench.py`` run) against the last COMMITTED
round record (the highest-numbered ``BENCH_local_rNN.json``) and fails on
any query that regressed more than 2x — but only for queries whose
committed time exceeds 0.5 s, which filters the run-to-run noise floor
(±20% plus multi-second GC spikes on a shared 32-thread JVM; see
.claude/skills/verify/SKILL.md) while still catching real plan
regressions (a lost broadcast, a new cartesian, a dropped pushdown turns
a 1 s query into 5-30 s) before the driver's round bench does.

The gate SKIPS when the latest capture predates the committed record or
covers a different SF / query subset — a stale or targeted-probe capture
is not evidence either way. It never skips silently on a fresh full run.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LATEST = os.path.join(REPO, "BENCH_local_latest.json")

# Noise filter: committed minimum must exceed this for the ratio to mean
# anything; sub-half-second queries flap 2-3x on scheduler jitter alone.
MIN_COMMITTED_S = 0.5
MAX_RATIO = 2.0


def _last_committed_record() -> tuple[str, dict] | None:
    best: tuple[int, str] | None = None
    for name in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_local_r(\d+)\.json", name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, name)
    if best is None:
        return None
    path = os.path.join(REPO, best[1])
    with open(path, encoding="utf-8") as fh:
        return best[1], json.load(fh)


def test_no_per_query_bench_regression():
    committed = _last_committed_record()
    if committed is None:
        pytest.skip("no committed BENCH_local_rNN.json to compare against")
    ref_name, ref = committed
    if not os.path.exists(LATEST):
        pytest.skip("no BENCH_local_latest.json — run python bench.py")
    ref_path = os.path.join(REPO, ref_name)
    if os.path.getmtime(LATEST) < os.path.getmtime(ref_path):
        pytest.skip(f"{LATEST} predates {ref_name} — stale capture")
    with open(LATEST, encoding="utf-8") as fh:
        latest = json.load(fh)
    if latest.get("sf") != ref.get("sf"):
        pytest.skip(
            f"latest capture is sf={latest.get('sf')}, committed record is "
            f"sf={ref.get('sf')} — targeted probe, not comparable")
    ref_q, new_q = ref["queries"], latest["queries"]
    common = {
        q for q in set(ref_q) & set(new_q)
        if ref_q[q] >= MIN_COMMITTED_S and new_q[q] > 0
    }
    if len(new_q) < len(ref_q) // 2:
        pytest.skip(
            f"latest capture covers {len(new_q)}/{len(ref_q)} queries — "
            "subset probe, not a full-run comparison")
    regressed = sorted(
        (q, ref_q[q], new_q[q]) for q in common
        if new_q[q] / ref_q[q] > MAX_RATIO
    )
    assert not regressed, (
        f"per-query regressions > {MAX_RATIO}x vs {ref_name} "
        "(committed_s, latest_s): "
        + ", ".join(f"{q} ({a:.2f} -> {b:.2f})" for q, a, b in regressed)
    )
    failed = sorted(q for q, v in new_q.items() if v < 0)
    assert not failed, f"queries FAILED in the latest bench run: {failed}"
