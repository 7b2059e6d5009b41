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
    fn = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "percent_rank": F.percent_rank,
        "cume_dist": F.cume_dist,
    }[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, fn().over(w))


def with_ntile(
    df: DataFrame,
    n: int,
    partition_by: list[str],
    order_by: list[Column],
    alias: str = "ntile",
) -> DataFrame:
    """Equal-frequency bucketing (quartiles/deciles) per group. The order
    must be TOTAL (add a unique tie-break column) or bucket boundaries are
    nondeterministic across engines and runs."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, F.ntile(n).over(w))


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


def sessionize(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    gap_seconds: int,
    tiebreak: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch gap-based sessionization: assign each row a per-key session index
    that increments whenever the gap to the previous event exceeds
    ``gap_seconds`` (the batch twin of streaming/ops.session_agg, and the
    reference's "user activity session" analysis expressed declaratively).

    Classic lag+cumsum: one shuffle on ``keys``, then both window passes (the
    lag and the running sum) share the same partition/order spec, so Catalyst
    evaluates them in a single Window operator over sorted runs — O(n) per
    key, no second exchange. Scales to 100 TB the same way every window op
    here does: per-key data streams through sorted; skewed keys (one user with
    millions of events) are the only hazard and are bounded by the session
    gap itself at analysis time.

    ``tiebreak`` columns make the intra-key order total when timestamps can
    collide (required for cross-engine determinism).
    """
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = (prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(run))
