"""Join operators (SURVEY §2.6): equi / semi / anti / as-of, broadcast-aware.

The reference reaches these through its arbitrary-pandas executor
(``pd.merge`` / ``merge_asof`` — reference: tool_call_agent.py:30-54 executes
any program); our engine exposes them as first-class DataFrame ops.

Scale notes:
- ``equi_join`` takes a ``broadcast_right`` hint for dimension tables; with AQE
  on, Catalyst will also auto-switch to broadcast when runtime stats allow.
- ``asof_join`` is implemented as union-merge + window (the "sort-merge as-of"
  pattern): both sides shuffle ONCE on the key and sort by time, then a
  last_value window carries the most recent right-row forward. This avoids the
  naive range-join (which explodes to O(|L|·|R|) pairs per key) and scales to
  arbitrarily large sides; skewed keys are handled by AQE skew-join on the
  single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of left with a match in right (no right columns, no fan-out)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of left with NO match in right — the reference's validation
    pattern ('rows failing validation')."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of (nearest-past) join: for each left row, attach the right row with
    the greatest ``right_time`` <= ``left_time`` for the same key
    (``pd.merge_asof`` semantics, backward direction).

    Implementation: tag both sides, union on (key, time), sort within key, and
    carry the last-seen right values forward with a running window — a single
    shuffle on ``key``, linear in |L|+|R|.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    l_tagged = left.withColumn("__t", lt.cast("timestamp")).withColumn("__is_left", F.lit(1))
    r_tagged = (
        right.select(
            F.col(key),
            rt.cast("timestamp").alias("__t"),
            *[F.col(v).alias(f"{v}{suffix}") for v in right_values],
        )
        .withColumn("__is_left", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # Right rows sort before left rows at identical timestamps so an exact-time
    # match is visible to the left row (merge_asof allow_exact_matches=True).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for v in right_values:
        carried = carried.withColumn(
            f"{v}{suffix}", F.last(F.col(f"{v}{suffix}"), ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left", "__t")
