"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints a full
per-query JSON line followed by a short final summary line
{"metric": ..., "value": N, "unit": "sec", "sf": ...} sized to survive the
driver's bounded stdout-tail capture (per-query timings also mirror to stderr).

Each query is forced through a noop sink (df.write.format("noop")) so the full
plan executes — aggregation, shuffle, window — without driver-side collect
costs polluting the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agent_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="adw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    # Untimed warmup (JVM/codegen/parquet-footer caches): without it the
    # alphabetically-first query absorbs several seconds of one-time cost and
    # per-query numbers aren't attributable (round-1 lesson).
    try:
        warm = qs.get("a1_pricing_summary") or next(iter(qs.values()))
        warm(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    for name in sorted(qs):
        start = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t0, 3)

    sf_raw = sf_dir.rstrip("/").split("sf")[-1]
    sf = float(sf_raw) if sf_raw.replace(".", "").isdigit() else sf_raw
    # Round-3 lesson: the driver keeps only a bounded stdout TAIL, and the
    # single 83-query JSON line outgrew it (BENCH_r03 "parsed": null). So:
    # full per-query line FIRST (visible when the tail is long enough, and
    # mirrored per-query on stderr), then a short complete summary line LAST —
    # the last stdout line must always fit the tail.
    for name in sorted(timings):
        print(f"bench_query {name} {timings[name]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    print(
        json.dumps(
            {"metric": "total_query_wall_time", "value": total, "unit": "sec",
             "sf": sf, "n_queries": len(timings),
             "failed": sorted(k for k, v in timings.items() if v < 0)}
        )
    )


if __name__ == "__main__":
    main()
