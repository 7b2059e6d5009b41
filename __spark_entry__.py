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
    """One entry per implemented operator from SURVEY.md §2 (relational tier in
    queryset.py, LLM-data-pipeline tier in queryset_nstar.py)."""
    from agent_data_wrangler_spark.queryset import QUERIES
    from agent_data_wrangler_spark.queryset_nstar import QUERIES as NSTAR

    return {**QUERIES, **NSTAR}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query.
    Rows-only queries (hash-function-dependent LSH/MinHash/SimHash paths)
    intentionally have no entry — the driver records the weaker check."""
    from agent_data_wrangler_spark.queryset import ORACLE
    from agent_data_wrangler_spark.queryset_nstar import ORACLE as NSTAR

    return {**ORACLE, **NSTAR}
