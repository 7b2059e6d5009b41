"""Set operators (SURVEY §2.6): union / intersect / except — the reference
reaches these via ``pd.concat`` and index ops; we use Spark's built-ins (all
partial+final hash-aggregate based, no driver involvement).

``diff_rows`` is how the engine verifies cleaning steps (clean-vs-dirty row
diff, SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=True) if by_name else a.union(b)


def intersect_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def diff_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """Rows in ``a`` not in ``b`` (multiset semantics by default — exceptAll —
    so duplicate-row handling is visible in the diff)."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
