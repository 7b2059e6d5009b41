"""Registry-wide persisted-frame teardown audit (r09 verdict item 8).

Several registry queries persist an intermediate frame and return a result
that still depends on it (bm1's tf frame, n5's pair frames, ...) — they
cannot unpersist before the caller collects, so each invocation leaves cache
entries behind. Individually negligible; this tool measures whether the
PATTERN is: it runs every registry query at a scale factor, collects it
(exactly what the bench harness does), and records the cache entries + bytes
left behind per query, then the cumulative total for a full sweep.

    python tools/persist_audit.py [--sf-dir /root/testdata/sf0.01]
                                  [--out PERSIST_AUDIT.md]
                                  [--clear-between | --combined]

Default mode ACCUMULATES across queries (the bench-sweep behavior being
audited); --clear-between clears the cache after each query; --combined
publishes the r10-verdict shape (clear-between attribution table +
accumulate residual totals in one report). Per-query attribution is by RDD
IDENTITY (ids added between a query's settled start and settled end), so
rows are non-negative by construction and immune to ContextCleaner GC and
lingering-localCheckpoint re-charging. The verdict threshold: if a
full-sweep total exceeds ~100 MB at bench SF, the bench harness gains an
unpersist hook.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cache_stats(spark) -> tuple[int, int, int]:
    """(n_cached_rdds, mem_bytes, disk_bytes) from the JVM storage view."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n, mem, disk = 0, 0, 0
    for info in infos:
        n += 1
        mem += info.memSize()
        disk += info.diskSize()
    return n, mem, disk


def _storage_infos(spark) -> dict[int, int]:
    """{rdd_id: total_bytes} for every RDD with cached blocks."""
    return {
        info.id(): info.memSize() + info.diskSize()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def _settled_storage_infos(spark, *, poll_s: float = 0.1,
                           timeout_s: float = 3.0) -> dict[int, int]:
    """Identity-level twin of _settled_cache_stats: the per-RDD storage map
    after async unpersists settle (two consecutive identical reads)."""
    prev = _storage_infos(spark)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(poll_s)
        cur = _storage_infos(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def _settled_cache_stats(spark, *, poll_s: float = 0.1,
                         timeout_s: float = 3.0) -> tuple[int, int, int]:
    """Cache stats AFTER async unpersists settle.

    `DataFrame.unpersist()` (blocking=False, the registry default) returns
    before the block manager drops the blocks; snapshotting immediately
    after query X can therefore capture blocks X already released, and
    their disappearance gets charged to query X+1 as a NEGATIVE delta —
    the r10-verdict misattribution this poll removes. Settled = two
    consecutive reads `poll_s` apart are identical; bounded by
    `timeout_s` so a genuinely persisted frame (an intentional residual)
    never deadlocks the audit.
    """
    prev = _cache_stats(spark)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(poll_s)
        cur = _cache_stats(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--clear-between", action="store_true")
    ap.add_argument(
        "--combined", action="store_true",
        help="publish the r10-verdict shape: clear-between per-query "
        "attribution table + accumulate-sweep residual totals, one report")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    def sweep(clear_between: bool):
        # Attribution is by RDD IDENTITY, not aggregate bytes: a query is
        # charged exactly the cached RDDs that exist at its settled end and
        # did NOT exist at its settled start. This is non-negative by
        # construction AND immune to the two aggregate-delta artifacts the
        # r10/r11 regens hit: (a) ContextCleaner GC of an EARLIER query's
        # abandoned blocks landing as a negative delta mid-query, and
        # (b) lingering localCheckpoint blocks (clearCache clears SQL
        # relations, not checkpoint RDD blocks) being re-charged to every
        # subsequent query after a clear-to-zero re-baseline.
        rows = []
        spark.catalog.clearCache()
        prev = _settled_storage_infos(spark)
        start_base = dict(prev)
        for name, fn in entry.queries().items():
            err = None
            try:
                fn(spark, args.sf_dir).collect()
            except Exception as exc:  # audit must survive env-gated queries
                err = f"ERR {type(exc).__name__}"
            cur = _settled_storage_infos(spark)
            added = {rid: b for rid, b in cur.items() if rid not in prev}
            if added or err:
                rows.append((name, len(added), sum(added.values()), err or ""))
            if clear_between:
                spark.catalog.clearCache()
                cur = _settled_storage_infos(spark)
            prev = cur
        # Residual is identity-relative to THIS sweep's start: blocks that
        # predate the sweep (e.g. a prior --combined sweep's lingering
        # localCheckpoint RDDs in the same JVM, not yet ContextCleaner-GC'd)
        # must not inflate what ONE sweep is measured to leave behind.
        end = _settled_storage_infos(spark)
        residual = {rid: b for rid, b in end.items() if rid not in start_base}
        return rows, (len(residual), sum(residual.values()))

    def table(rows):
        out = ["| query | leaked entries | leaked bytes | note |",
               "|---|---|---|---|"]
        for name, d_n, d_bytes, note in rows:
            out.append(f"| {name} | {d_n} | {d_bytes} | {note} |")
        if not rows:
            out.append("| (none) | 0 | 0 |  |")
        return out

    header = [
        "# Persisted-frame teardown audit (generated by "
        "tools/persist_audit.py)",
        "",
        f"sf_dir: {args.sf_dir}",
        "",
    ]
    if args.combined:
        # The r10-verdict item-5 shape: per-query attribution comes from the
        # clear-between sweep (non-negative by construction — the cache is
        # empty before every query, so ContextCleaner GC of an EARLIER
        # query's abandoned references can never land as a negative delta
        # on a later row); the accumulate sweep reproduces bench behavior
        # but is reported as its residual TOTAL only, where cross-query GC
        # attribution noise cannot mislead.
        attr_rows, _ = sweep(clear_between=True)
        _, acc_total = sweep(clear_between=False)
        lines = header + [
            "## Per-query attribution (clear-between sweep)",
            "",
        ] + table(attr_rows) + [
            "",
            "## Bench-behavior residual (accumulate sweep, totals only)",
            "",
            f"Full-sweep residual: {acc_total[0]} cached RDDs, "
            f"{acc_total[1]} bytes = {acc_total[1] / 1e6:.1f} MB total "
            "(identity-relative to the sweep's own start, so blocks "
            "lingering from the preceding attribution sweep are excluded).",
            "",
            "Per-query rows are intentionally NOT reported for the "
            "accumulate sweep: Spark's ContextCleaner drops cached/"
            "localCheckpoint RDDs when their references are garbage-"
            "collected, seconds-to-minutes after the owning query "
            "finished, so accumulate-mode deltas land on whichever query "
            "is running (the r10 negative-row artifact).",
            "",
        ]
    else:
        rows, total = sweep(clear_between=args.clear_between)
        lines = header[:-1] + [
            "mode: "
            + ("clear-between (per-query attribution)"
               if args.clear_between else "accumulate (bench-sweep behavior)"),
            "",
        ] + table(rows) + [
            "",
            f"Full-sweep residual: {total[0]} cached RDDs, "
            f"{total[1]} bytes = {total[1] / 1e6:.1f} MB total "
            "(identity-relative to the sweep's start).",
            "",
        ]
    report = "\n".join(lines)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            fh.write(report)
        print(f"wrote {args.out}")
    else:
        print(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
