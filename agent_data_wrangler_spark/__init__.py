"""agent_data_wrangler_spark — a PySpark-native analytics/wrangling engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``ronaldjohnatanoso/agent_data_wrangler`` (an LLM-planned pandas
CSV wrangler — see SURVEY.md), re-expressed Spark-first:

- every operator is a declarative ``DataFrame -> DataFrame`` transform (Catalyst
  optimizes: pushdown, pruning, join selection, whole-stage codegen);
- statistical cleaning ops (median/mean/mode fill, 3-sigma filters, percentile
  caps) are fit-then-transform pairs: one aggregate job computes the statistics,
  then they are applied as literals — exactly the two-pass semantics the
  reference's generated pandas programs have (reference:
  graph_proj/src/agent/tool_call_agent.py:136-146);
- no arbitrary-code executor: the reference's "run any pandas program" surface
  (tool_call_agent.py:29-54) is replaced by a typed operator library plus a
  pandas_udf / applyInPandas escape hatch for genuinely custom logic.

Designed for a large cluster (100 TB): partial aggregation, broadcast joins for
small dimensions, AQE for skew/coalescing, no driver-side row loops anywhere in
an operator hot path.
"""

from agent_data_wrangler_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
