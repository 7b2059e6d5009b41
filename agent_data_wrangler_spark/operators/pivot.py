"""Pivot / crosstab / rollup / cube (SURVEY §2.6) — the reference reaches
these via ``pd.pivot_table`` / ``pd.crosstab``.

Scale notes: ``pivoted`` REQUIRES an explicit value list — without one Spark
runs an extra distinct job to discover pivot columns, and an unbounded value
set explodes the schema (the 100 TB failure mode). Rollup/cube multiply rows
into each grouping set map-side; keep the key list short.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def pivoted(
    df: DataFrame,
    group_by: list[str],
    pivot_col: str,
    values: list[str],
    agg: Column,
) -> DataFrame:
    return df.groupBy(*group_by).pivot(pivot_col, values).agg(agg)


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def crosstab(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Contingency table (``pd.crosstab`` parity): one output row per distinct
    ``row_col`` value, one output column per distinct ``col_col`` value
    (sorted), counts as bigint. Same 100 TB caveat as ``pivoted``: the column
    dimension must be LOW-cardinality — every distinct value becomes a schema
    column, and Spark runs a distinct pass to discover them."""
    return df.stat.crosstab(row_col, col_col)


def grouping_sets_agg(
    df: DataFrame,
    sets: list[list[str]],
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """GROUP BY GROUPING SETS — the generalization of rollup/cube to explicit
    grouping-set lists (Spark 4 native ``DataFrame.groupingSets``). Same
    map-side row multiplication as rollup: one copy per set the row feeds."""
    return df.groupingSets(sets, *keys).agg(*aggs)


def chi2_contingency(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Contingency-table independence diagnostics: per observed (a, b) cell,
    the count, the independence-expected count (row_total x col_total / N),
    and the chi-square contribution (obs - exp)^2 / exp — the drift /
    association check between two categorical columns.

    SCOPE: per-OBSERVED-cell diagnostics. Cells with zero observations are
    absent from the output (absent from the groupBy); their margins still
    count (an empty cell adds 0 to row/column totals), but an absent cell's
    chi-square term (0-exp)^2/exp = exp is NOT emitted — summing the
    `contribution` column therefore UNDERSTATES the full chi-square
    statistic whenever any (a, b) combination is unobserved. For the full
    statistic, cross-join the margins to materialize empty cells first.
    All totals are integer sums (exact in any order), so expected /
    contribution are IEEE-deterministic — safe to value-check cross-engine.

    Scale: ONE shuffle for the contingency counts (map-side combine →
    |cells| rows); the three window total passes run over the tiny cells
    frame, not the data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("observed"))
    row_t = F.sum("observed").over(Window.partitionBy(col_a))
    col_t = F.sum("observed").over(Window.partitionBy(col_b))
    n = F.sum("observed").over(Window.partitionBy())
    exp = row_t.cast("double") * col_t.cast("double") / n.cast("double")
    o = F.col("observed").cast("double")
    return (
        obs.withColumn("expected", F.round(exp, 6))
        .withColumn("contribution", F.round((o - exp) * (o - exp) / exp, 6))
        .withColumn("observed", F.col("observed").cast("bigint"))
    )
