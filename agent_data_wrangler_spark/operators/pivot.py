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
