"""Per-stage timing/shuffle profile for one registered query (guide §1).

Runs the named query with the bench protocol (untimed sf0.001 warmup, then a
timed noop-sink pass at $SPARK_GRAFT_SF_DIR), then reads the Spark UI REST API
for the stages of exactly that timed run and prints, per stage: wall time,
task time, shuffle read/write bytes, input bytes, and the stage name — the
"where is the time going" table the optimization guide's empirical loop needs.

Usage: python tools/stage_profile.py QUERY [QUERY ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as fh:
        return json.load(fh)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    from agent_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    import __spark_entry__ as e

    qs = e.queries()
    for name in names:
        # Warm the plan shape (codegen) untimed, like bench.py.
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        jobs = [j for j in _rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: {took:.3f}s wall, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                attempts = _rest(base, f"/stages/{sid}")
            except Exception:
                continue
            for st in attempts:
                if st.get("status") != "COMPLETE":
                    continue
                dur = 0.0
                if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                    fmt = "%Y-%m-%dT%H:%M:%S.%f"
                    a = time.strptime(st["firstTaskLaunchedTime"][:-3], fmt)
                    b = time.strptime(st["completionTime"][:-3], fmt)
                    dur = (time.mktime(b) + float(st["completionTime"][20:23]) / 1000
                           - time.mktime(a) - float(st["firstTaskLaunchedTime"][20:23]) / 1000)
                rows.append((
                    sid, dur, st["executorRunTime"] / 1000.0,
                    st["numCompleteTasks"],
                    st["inputBytes"], st["shuffleReadBytes"],
                    st["shuffleWriteBytes"],
                    st["name"].split("\n")[0][:90],
                ))
        rows.sort(key=lambda r: -r[1])
        print(f"{'stage':>5} {'wall_s':>7} {'task_s':>7} {'tasks':>5} "
              f"{'input':>10} {'sh_read':>10} {'sh_write':>10}  name")
        for r in rows:
            print(f"{r[0]:>5} {r[1]:>7.2f} {r[2]:>7.2f} {r[3]:>5} "
                  f"{r[4]:>10} {r[5]:>10} {r[6]:>10}  {r[7]}")


if __name__ == "__main__":
    main()
