"""Profiling / metadata operators P1-P9 (SURVEY §2.2) — the reference's
"DESCRIBE" surface, mandated in one prompt sentence (reference:
graph_proj/src/agent/tool_call_agent.py:136: "print the columns, print the
number of rows and columns, print df.head(5), show df.dtypes, print basic
statistics with df.describe(), and print counts of missing/null values per
column") plus the ``basic_info`` catalog cache (reference: system.txt:2).

Scale notes: every profile statistic here is a single partial+final aggregate
over the table (one shuffle of a handful of rows); ``describe_numeric`` and
``null_counts`` compute ALL columns in one pass rather than one job per column.
Percentiles use exact ``percentile`` (required for oracle parity — SURVEY §4);
at 100 TB a caller can flip ``approx=True`` to get ``percentile_approx`` which
is a single-pass sketch.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    NumericType,
    StringType,
    StructField,
    StructType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    """Exact type check (not simpleString prefixes — 'int' would also match
    'interval ...' types and misclassify them as numeric)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def shape(df: DataFrame) -> tuple[int, int]:
    """P2: (rows, cols)."""
    return df.count(), len(df.columns)


def head(df: DataFrame, n: int = 5) -> DataFrame:
    """P3: limit-n preview — TakeOrderedAndProject-free, reads ~1 partition."""
    return df.limit(n)


def dtypes(df: DataFrame) -> list[tuple[str, str]]:
    """P4: (column, type) pairs straight from the analyzed schema (no job)."""
    return df.dtypes


def null_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P6: per-column null counts in ONE aggregate pass.

    Output: one row per column — (column, null_count) — long format so the
    result is stable under column-set changes and easy to oracle-check.
    """
    cols = columns or df.columns
    agg = df.agg(
        *[F.sum(F.col(c).isNull().cast("bigint")).alias(c) for c in cols]
    )
    # unpivot to long form: (column, null_count)
    stacked = agg.select(
        F.expr(
            "stack({n}, {args}) as (column, null_count)".format(
                n=len(cols),
                args=", ".join(f"'{c}', `{c}`" for c in cols),
            )
        )
    )
    return stacked


def _java_double_key(v: float) -> int:
    """Sort key reproducing java.lang.Double ordering (-0.0 < 0.0, NaN last)
    — the order Spark's Percentile aggregate sorts its value-count map by."""
    b = struct.unpack(">q", struct.pack(">d", v))[0]
    return b if b >= 0 else b ^ 0x7FFFFFFFFFFFFFFF


def _exact_quartiles_bracketed(
    df: DataFrame, cols: list[str], *, accuracy: int = 10_000,
    interior_cap: int = 100_000,
) -> list[tuple] | None:
    """Exact describe stats via TWO bounded aggregate passes instead of one
    pass that buffers each column's full value→count map per executor and
    merges it single-threaded on one final-aggregate task (guide §5 — the
    r13-measured 2.8 s of p5's budget on one 583k-distinct column, and a
    memory scale-killer at 100 TB).

    Pass 1: count/mean/std/min/max + a NaN probe + GK-sketch brackets
    ``percentile_approx(col, p ± 3/accuracy)`` per quartile. GK's rank error
    is DETERMINISTIC (≤ n/accuracy), so the true order statistics at
    ``p·(n-1)`` provably lie between the bracket values.

    Pass 2: per (column, quartile): #values strictly below the bracket,
    boundary tie counts, and the SORTED interior values. The interior is
    rank-bounded by ~8n/accuracy BY CONSTRUCTION (boundary ties are counted,
    never collected, so massive ties — constant or bimodal columns — cannot
    blow up the collect; when the two bracket values coincide the quartile
    IS that value and nothing is collected). ``accuracy`` is re-derived from
    n when the bound would exceed ``interior_cap``, keeping the driver
    collect bounded at any scale.

    The driver then reads the two order statistics out of the reconstructed
    [lo×ties, interior..., hi×ties] segment (java.lang.Double order, exactly
    Spark's Percentile sort) and interpolates with Percentile.getPercentile's
    own formula ``(higher-pos)·lowerKey + (pos-lower)·higherKey`` — pinned
    bit-identical to ``F.percentile`` by test_describe_bracketed_bit_identical.

    Returns the describe rows, or None when exactness cannot be guaranteed
    cheaply (NaN present, or a bracket assertion fails) — callers fall back
    to the single-pass exact plan.
    """
    ps = (0.25, 0.50, 0.75)
    margin = 3.0 / accuracy
    bracket_ps = [max(0.0, p - margin) for p in ps] + [min(1.0, p + margin) for p in ps]
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c).cast("double")
        aggs.extend([
            F.count(col).alias(f"__n{i}"),
            F.avg(col).alias(f"__mean{i}"),
            F.stddev_samp(col).alias(f"__std{i}"),
            F.min(col).alias(f"__min{i}"),
            F.max(col).alias(f"__max{i}"),
            F.sum(F.isnan(col).cast("bigint")).alias(f"__nan{i}"),
            F.percentile_approx(
                col, F.array(*[F.lit(p) for p in bracket_ps]), F.lit(accuracy)
            ).alias(f"__br{i}"),
        ])
    one = df.agg(*aggs).collect()[0]
    if any(int(one[f"__nan{i}"] or 0) > 0 for i in range(len(cols))):
        return None  # NaN sorts above +inf in the exact aggregate; fall back
    n_max = max(int(one[f"__n{i}"]) for i in range(len(cols))) if cols else 0
    if 8 * n_max // accuracy > interior_cap:
        # Bigger corpus than the default accuracy bounds: re-derive the
        # brackets with accuracy ∝ n so the pass-2 collect stays capped.
        return _exact_quartiles_bracketed(
            df, cols,
            accuracy=max(accuracy, (8 * n_max) // interior_cap + 1),
            interior_cap=interior_cap,
        )
    # Pass 2: bracketed rank math per (column, quartile) with lo != hi.
    p2_aggs, plan = [], {}
    for i, c in enumerate(cols):
        n = int(one[f"__n{i}"])
        br = one[f"__br{i}"]
        if n == 0 or br is None:
            continue
        lo3, hi3 = br[:3], br[3:]
        for j in range(3):
            lo, hi = float(lo3[j]), float(hi3[j])
            col = F.col(c).cast("double")
            tag = f"__q{i}_{j}"
            plan[(i, j)] = (lo, hi)
            p2_aggs.extend([
                F.sum((col < F.lit(lo)).cast("bigint")).alias(f"{tag}_below"),
                F.sum((col == F.lit(lo)).cast("bigint")).alias(f"{tag}_eqlo"),
            ])
            if lo != hi:
                # lo == hi needs no interior/hi aggregates: the segment is
                # the lo tie block alone (still rank-assert-guarded below).
                p2_aggs.extend([
                    F.sum((col == F.lit(hi)).cast("bigint")).alias(f"{tag}_eqhi"),
                    F.sort_array(
                        F.collect_list(
                            F.when((col > F.lit(lo)) & (col < F.lit(hi)), col)
                        )
                    ).alias(f"{tag}_mid"),
                ])
    two = df.agg(*p2_aggs).collect()[0] if p2_aggs else None
    rows: list[tuple] = []
    for i, c in enumerate(cols):
        n = int(one[f"__n{i}"])
        if n == 0 or one[f"__br{i}"] is None:
            rows.append((c, n, one[f"__mean{i}"], one[f"__std{i}"],
                         one[f"__min{i}"], None, None, None, one[f"__max{i}"]))
            continue
        br = one[f"__br{i}"]
        quarts: list[float] = []
        for j, p in enumerate(ps):
            pos = p * (n - 1)
            lo, hi = plan[(i, j)]
            tag = f"__q{i}_{j}"
            below = int(two[f"{tag}_below"])
            eq_lo = int(two[f"{tag}_eqlo"])
            if lo == hi:
                eq_hi, mid = 0, []
            else:
                eq_hi = int(two[f"{tag}_eqhi"])
                mid = sorted(two[f"{tag}_mid"], key=_java_double_key)
            seg_len = eq_lo + len(mid) + eq_hi
            lower, higher = math.floor(pos), math.ceil(pos)
            if not (below <= lower and higher <= below + seg_len - 1):
                return None  # bracket missed the rank window — fall back

            def key_at(r: int) -> float:
                k = r - below
                if k < eq_lo:
                    return lo
                k -= eq_lo
                if k < len(mid):
                    return float(mid[k])
                return hi

            lower_key = key_at(int(lower))
            if higher == lower:
                quarts.append(lower_key)
                continue
            higher_key = key_at(int(higher))
            if higher_key == lower_key:
                quarts.append(lower_key)
                continue
            quarts.append((higher - pos) * lower_key + (pos - lower) * higher_key)
        rows.append((c, n, one[f"__mean{i}"], one[f"__std{i}"],
                     one[f"__min{i}"], quarts[0], quarts[1], quarts[2],
                     one[f"__max{i}"]))
    return rows


_DESCRIBE_SCHEMA = StructType([
    StructField("column", StringType(), True),
    StructField("count", LongType(), True),
    StructField("mean", DoubleType(), True),
    StructField("std", DoubleType(), True),
    StructField("min", DoubleType(), True),
    StructField("p25", DoubleType(), True),
    StructField("p50", DoubleType(), True),
    StructField("p75", DoubleType(), True),
    StructField("max", DoubleType(), True),
])


def describe_numeric(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    *,
    bracket_min_bytes: int = 8_000_000,
) -> DataFrame:
    """P5: count/mean/std/min/25%/50%/75%/max for numeric columns, one pass.

    pandas ``describe()`` uses sample stddev (ddof=1) → ``stddev_samp``
    (SURVEY §4 parity rule). Output long format: one row per column.

    Above ``bracket_min_bytes`` of plan-estimated input (the describe_auto
    size-probe pattern) the exact path runs the two-pass bracketed quartile
    selection (:func:`_exact_quartiles_bracketed`) — bit-identical to
    ``F.percentile`` (test-pinned) WITHOUT per-executor full value-map
    buffering, which is the exact percentile's memory scale-killer at
    100 TB (guide §5). Below the threshold the single-pass plan wins: the
    bracket path's fixed cost is a second aggregate job, and on a small
    table the value map it avoids is itself small (measured crossover at
    sf0.1: lineitem/600k rows 2.26→2.13 s, orders/150k rows 0.50→0.77 s —
    hence a default between those tables' plan sizes). The bracket path
    additionally falls back to the single-pass plan whenever its rank math
    cannot certify exactness (NaN present, bracket assertion miss).
    """
    cols = columns or numeric_columns(df)
    if not approx and cols:
        try:
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:  # Spark Connect / stats unavailable: assume big
            size = bracket_min_bytes + 1
        if size > bracket_min_bytes:
            rows = _exact_quartiles_bracketed(df, cols)
            if rows is not None:
                return df.sparkSession.createDataFrame(rows, _DESCRIBE_SCHEMA)
    return _describe_numeric_onepass(df, cols, approx)


def _describe_numeric_onepass(df: DataFrame, cols: list[str], approx: bool) -> DataFrame:
    """The original single-aggregate describe plan: the only exact-quartile
    choice when brackets can't certify exactness, and the approx path."""
    # ONE percentile aggregate per column with the quartile array — three
    # scalar percentile calls would each buffer the column's full value set
    # independently (3x the memory and merge cost of the single-array form;
    # measured ~4x slower on a 3-column describe).
    pct = F.percentile_approx if approx else F.percentile
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs.extend(
            [
                F.count(col).alias(f"{c}__count"),
                F.avg(col).alias(f"{c}__mean"),
                F.stddev_samp(col).alias(f"{c}__std"),
                F.min(col).alias(f"{c}__min"),
                pct(col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(f"{c}__pcts"),
                F.max(col).alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    stats = ["count", "mean", "std", "min", "p25", "p50", "p75", "max"]
    _expr = {"p25": "`{c}__pcts`[0]", "p50": "`{c}__pcts`[1]", "p75": "`{c}__pcts`[2]"}
    rows = ", ".join(
        "'{c}', {vals}".format(
            c=c,
            vals=", ".join(_expr.get(s, f"`{{c}}__{s}`").format(c=c) for s in stats),
        )
        for c in cols
    )
    return wide.select(
        F.expr(f"stack({len(cols)}, {rows}) as (column, {', '.join(stats)})")
    )


def describe_auto(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_max_bytes: int = 2_000_000_000,
) -> DataFrame:
    """P5 with a size-based exact/approx switch — the pipeline-registry
    default for describe at scale.

    Exact ``percentile`` buffers each column's full value set per executor —
    correct and oracle-matchable, but a memory scale-killer on a 100 TB
    column. ``percentile_approx`` is a fixed-size sketch. The switch reads
    Catalyst's plan-estimated ``sizeInBytes`` (no extra job — a count-based
    switch would itself cost a full scan) and flips to the sketch above
    ``exact_max_bytes``. Anything Catalyst can't size (no stats at all) is
    treated as big: the approx path is the safe default at scale.
    """
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # Spark Connect / stats unavailable: assume big
        size = exact_max_bytes + 1
    return describe_numeric(df, columns, approx=size > exact_max_bytes)


def value_counts(df: DataFrame, column: str) -> DataFrame:
    """P8/A3: ordered value counts of a categorical (typo discovery in the
    reference — 'Germny', 'enginr'). Deterministic order: count desc, value asc."""
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc_nulls_first("value"))
    )


def key_skew(df: DataFrame, key: str) -> DataFrame:
    """Key-distribution profiler: the pre-flight check for every join/groupBy
    on ``key`` at scale. One row out: (n_keys, n_rows, max_key_rows,
    skew_factor = max key count ÷ mean key count). A skew_factor in the
    hundreds says "this key will flood one reducer" — route the operation
    through salted_join/two_phase_agg or rely on AQE skew split.

    Cost: one shuffle on ``key`` (partial counts map-side), then a scalar
    aggregate over |keys| rows — safe at any scale.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    mean_c = F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.round(F.max("c").cast("double") / mean_c, 4).alias("skew_factor"),
    )


def duplicate_row_count(df: DataFrame, subset: list[str] | None = None) -> int:
    """P9: number of surplus duplicate rows (count - distinct count).

    One job: groupBy the subset (partial counts map-side), then
    sum(count) - n_groups — the previous count + dropDuplicates().count()
    form scanned the table twice for the same integers (r13-opt)."""
    cols = subset or df.columns
    row = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.coalesce(F.sum("__c"), F.lit(0)).alias("__total"),
            F.count(F.lit(1)).alias("__distinct"),
        )
        .collect()[0]
    )
    return int(row["__total"]) - int(row["__distinct"])


@dataclass
class TableProfile:
    """P7: the ``basic_info`` catalog cache (reference: system.txt:2) — computed
    once per source version, reused across pipeline stages instead of
    re-profiling (reference: tool_call_agent.py:143-145 mandates not repeating
    exploration)."""

    n_rows: int
    n_cols: int
    columns: list[str]
    dtypes: list[tuple[str, str]]
    null_counts: dict[str, int] = field(default_factory=dict)

    @classmethod
    def of(cls, df: DataFrame) -> "TableProfile":
        # ONE aggregate pass: row count and every per-column null count in
        # the same job (the previous shape() + null_counts() pair scanned
        # the table twice for numbers one partial+final aggregate
        # produces; r13-opt, guide §1.2 "don't compute things twice").
        row = df.agg(
            F.count(F.lit(1)).alias("__n_rows"),
            *[
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{i}")
                for i, c in enumerate(df.columns)
            ],
        ).collect()[0]
        nulls = {
            c: int(row[f"__null_{i}"] or 0) for i, c in enumerate(df.columns)
        }
        return cls(
            n_rows=int(row["__n_rows"]),
            n_cols=len(df.columns),
            columns=list(df.columns),
            dtypes=df.dtypes,
            null_counts=nulls,
        )


def histogram(df: DataFrame, column: str, *, bucket_width: float) -> DataFrame:
    """Fixed-width histogram of a numeric column: bucket index, row count,
    and the bucket's [lo, hi) bounds. The profiling step after describe() —
    shape, not just moments.

    Scale: bucket assignment is a scan-stage expression; the groupBy shuffles
    |buckets| partial counts (map-side combine), never rows. Fixed widths
    (vs equi-depth) keep the op one-pass and deterministic; for equi-depth
    use describe()'s exact percentiles as the edges.
    """
    b = F.floor(F.col(column) / F.lit(bucket_width)).cast("bigint")
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(bucket_width)).alias("lo"),
            ((F.col("bucket") + 1) * F.lit(bucket_width)).alias("hi"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
