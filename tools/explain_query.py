"""Dump .explain('formatted') for named registered queries to files.

Usage: python tools/explain_query.py OUTDIR SUFFIX query1 [query2 ...]
       (sf dir via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01)

Writes OUTDIR/<query>_<SUFFIX>.txt — the round's plan-evidence artifacts
(plans/r13/*_before.txt / *_after.txt).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)

    from agent_data_wrangler_spark.session import get_spark

    spark = get_spark(app_name="explain-query")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
