"""Deterministic dataset splitting for training pipelines (SURVEY §2.7
extension): assign each row to train/val/test by hashing a stable id — the
split every run, every engine, every rerun of the pipeline reproduces
exactly. Contrast randomSplit(), whose assignment depends on partitioning
and Spark's RNG stream (fine for experiments, wrong for a dataset card).

Mechanism: md5 of (salt || id), compare the first 8 hex chars against
precomputed hex boundaries — lexicographic order on fixed-width lowercase
hex equals numeric order, so the comparison is a uniform draw in [0, 1)
that DuckDB reproduces byte-for-byte (oracle-checkable). Pure Column
expressions: the split is assigned inside the scan stage, no shuffle, no
RNG state, and composes with partition pruning when the split column is
used as a write partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_boundaries(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(label, upper-bound-hex) pairs in declaration order; bounds are
    cumulative fractions scaled to the 32-bit hex space. The final label
    absorbs rounding remainder, so fractions need not sum to exactly 1.0."""
    if any(f < 0 for f in fractions.values()):
        raise ValueError("split fractions must be non-negative")
    total = sum(fractions.values())
    if total <= 0:
        raise ValueError("split fractions must sum to > 0")
    bounds = []
    cum = 0.0
    for label, frac in fractions.items():
        cum += frac / total
        bounds.append((label, format(min(int(cum * 16**8), 16**8 - 1), "08x")))
    return bounds


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    *,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label column. ``salt`` versions the split:
    changing it re-draws every assignment (a new split epoch) while keeping
    the old one reproducible from its salt."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))), 1, 8
    )
    expr: Column | None = None
    bounds = split_boundaries(fractions)
    for label, hi in bounds[:-1]:
        cond = bucket <= F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = bounds[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn(out_col, expr)


def split_boundaries_sql(fractions: dict[str, float], id_expr: str, salt: str = "split-v1") -> str:
    """The DuckDB CASE expression mirroring hash_split — generated from the
    same boundaries so Spark query and oracle can never drift."""
    bounds = split_boundaries(fractions)
    bucket = f"substr(md5('{salt}' || ':' || CAST({id_expr} AS VARCHAR)), 1, 8)"
    cases = "".join(
        f" WHEN {bucket} <= '{hi}' THEN '{label}'" for label, hi in bounds[:-1]
    )
    return f"CASE{cases} ELSE '{bounds[-1][0]}' END"
