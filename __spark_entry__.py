"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation on sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's oracle-checked registry
(agent_data_wrangler_spark/queryset*.py) — one entry per implemented operator
from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from agent_data_wrangler_spark.queryset import QUERIES

    return QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from agent_data_wrangler_spark.queryset import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    from agent_data_wrangler_spark.queryset import ORACLE

    return dict(ORACLE)
