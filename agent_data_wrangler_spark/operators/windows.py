"""Window-function operators (SURVEY §2.6): ranking, lag/lead, rolling and
cumulative frames — the reference's "promotion timeline" analyses
(stash/dirty_hr_final_clean_report.txt:20) generalized.

Scale notes: each helper shuffles once on the partition keys; unbounded-
preceding frames use Spark's streaming frame evaluation (O(n) per partition).
Partition keys must have reasonable cardinality — a single global ORDER BY
window is the classic 100 TB anti-pattern, so global rankings go through
``top_k`` (TakeOrderedAndProject) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    method: str = "row_number",
    alias: str = "rank",
) -> DataFrame:
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, fn().over(w))


def top_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], n: int = 1
) -> DataFrame:
    """Top-n rows per group (row_number filter — shuffle once, no collect)."""
    return ranked(df, partition_by, order_by, "row_number", "__rn").filter(
        F.col("__rn") <= n
    ).drop("__rn")


def with_lag(
    df: DataFrame,
    column: str,
    partition_by: list[str],
    order_by: list[Column],
    offset: int = 1,
    alias: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias or f"{column}_lag{offset}", F.lag(column, offset).over(w))


def cumulative(
    df: DataFrame,
    agg: Column,
    partition_by: list[str],
    order_by: list[Column],
    alias: str = "cum",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, agg.over(w))


def rolling(
    df: DataFrame,
    agg: Column,
    partition_by: list[str],
    order_by: list[Column],
    preceding: int,
    alias: str = "rolling",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(alias, agg.over(w))


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps k rows, driver merges k·p rows; no global sort shuffle."""
    return df.orderBy(*order_by).limit(k)
