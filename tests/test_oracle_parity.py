"""Local replica of the driver's t2 gate: run every registered query on Spark
AND its oracle SQL on DuckDB over the same parquet (sf0.001 for speed), then
compare row-multisets after sorting columns by name and normalizing floats.

This is the single most important test file: it catches Spark/DuckDB semantic
drift (percentile interpolation, stddev ddof, null ordering, type widths)
before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    # None-safe, cross-type-safe sort key: rollup/cube rows mix None and
    # values in the same position, which plain tuple sorting cannot order.
    def key(t):
        return tuple((v is None, str(type(v)), 0 if v is None else v) for v in t)

    return sorted(
        (tuple(_normalize(r[i]) for i in order) for r in rows), key=key
    ), [columns[i] for i in order]


def _collect_spark(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return _rows_to_multiset(cols, rows)


def _collect_duck(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    return _rows_to_multiset(cols, rows)


def _registry():
    from agent_data_wrangler_spark.queryset import ORACLE, QUERIES

    try:
        from agent_data_wrangler_spark.queryset_nstar import (
            ORACLE as O2,
            QUERIES as Q2,
        )

        return {**QUERIES, **Q2}, {**ORACLE, **O2}
    except ImportError:
        return QUERIES, ORACLE


QUERIES, ORACLE = _registry()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, sf_dir):
    con = _duck(sf_dir)
    spark_rows, spark_cols = _collect_spark(QUERIES[name](spark, sf_dir))
    duck_rows, duck_cols = _collect_duck(con, ORACLE[name])
    assert [c.lower() for c in spark_cols] == [c.lower() for c in duck_cols], (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (s, d) for s, d in zip(spark_rows, duck_rows) if s != d
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_no_rows_only_queries():
    """Since round 5 every registered query carries a DuckDB oracle; a new
    rows-only entry would silently get the weaker driver check, so fail loudly
    here instead of auto-skipping an empty parameter set (r05 verdict item 2)."""
    rows_only = sorted(set(QUERIES) - set(ORACLE))
    assert rows_only == [], f"queries missing oracles: {rows_only}"


# NEGATIVE CONTROLS: one per query FAMILY (r08 verdict item 4). A
# normalizer bug can be family-specific — e.g. a float-rounding change
# that only collapses aggregate drift, or a verdict-frame compare that
# ignores booleans — so a single perturbed aggregate is not enough
# evidence that "everything green" means anything. Representative shapes:
# aggregate (a1), equi join (j1), window (w1), explode/text (tf1),
# dedup-verdict 1-row frame (n6), streaming drain (st1), layout-verdict
# booleans (zo1).
_DRIFT_FAMILIES = [
    "a1_pricing_summary",
    "j1_revenue_by_segment",
    "w1_top_order_per_customer",
    "tf1_tfidf_top_terms_documents",
    "n6_simhash_documents",
    "st1_streaming_window_counts",
    "zo1_zorder_layout_events",
]


def _perturb_one_column(df):
    """Return (df', column) with ONE column deliberately drifted on every
    row, type-dispatched: booleans flip, numerics move by more than the
    comparator's round(·, 6) grain, strings/dates get visibly different
    values. Raises if the frame has no perturbable column — a family whose
    control cannot drift is a family without a real check."""
    from pyspark.sql import functions as F, types as T

    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.BooleanType):
            repl = ~c
        elif isinstance(field.dataType, (T.DoubleType, T.FloatType,
                                         T.DecimalType)):
            repl = c + F.lit(0.01)
        elif isinstance(field.dataType, (T.LongType, T.IntegerType,
                                         T.ShortType, T.ByteType)):
            repl = c + F.lit(1)
        elif isinstance(field.dataType, T.StringType):
            repl = F.concat(F.coalesce(c, F.lit("")), F.lit("~drift"))
        elif isinstance(field.dataType, (T.TimestampType, T.DateType,
                                         T.TimestampNTZType)):
            repl = F.date_add(c, 1).cast(field.dataType)
        else:
            continue
        return df.withColumn(field.name, repl.cast(field.dataType)), field.name
    raise AssertionError(
        f"no perturbable column in {df.columns} — cannot plant drift")


@pytest.mark.parametrize("name", _DRIFT_FAMILIES)
def test_oracle_parity_detects_drift(name, spark, sf_dir):
    """Each family's deliberately perturbed query must FAIL parity.

    Guards the comparator itself — if a normalizer bug ever made
    `_rows_to_multiset` collapse genuinely different results to equal
    values, every green above would be meaningless."""
    con = _duck(sf_dir)
    perturbed, col = _perturb_one_column(QUERIES[name](spark, sf_dir))
    spark_rows, spark_cols = _collect_spark(perturbed)
    duck_rows, duck_cols = _collect_duck(con, ORACLE[name])
    assert [c.lower() for c in spark_cols] == [c.lower() for c in duck_cols]
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows != duck_rows, (
        f"{name}: comparator failed to detect planted drift in {col!r} — "
        "the parity harness is broken for this family shape")
