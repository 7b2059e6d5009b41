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


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    *,
    target_fraction: float,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic mixture sampling: downsample each source toward a target
    mixture — the "data recipe" op of LLM corpus construction (e.g. 30% of
    the corpus re-weighted so source s contributes ``weights[s]`` of it).

    Per source s: target rows = ``target_fraction * N_total * weights[s]``;
    sampling fraction = min(1, target / n_s). Selection is the same
    md5-uniform draw as :func:`hash_split` (u = first 8 hex chars of
    md5(salt:id) as a 32-bit integer / 2^32), so the selected set is exactly
    reproducible across engines, reruns, and partitionings — a dataset-card
    guarantee randomSplit/sample cannot give. Sources missing from
    ``weights`` get weight 0 (dropped).

    Scale: per-source counts are a partial+final aggregate (|sources| rows)
    broadcast-joined back; the draw and comparison are scan-stage Column
    expressions. No shuffle of the data rows, no RNG state, no collect.
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n_s"))
    # Global N over the tiny |sources|-row counts frame — a single-partition
    # window here is fine; the corpus itself never sees it.
    counts = counts.withColumn("__n_total", F.sum("__n_s").over(Window.partitionBy()))
    weight_expr = F.coalesce(
        *[
            F.when(F.col(source_col) == F.lit(s), F.lit(float(w)))
            for s, w in weights.items()
        ],
        F.lit(0.0),
    ) if weights else F.lit(0.0)
    frac = F.least(
        F.lit(1.0),
        (F.lit(float(target_fraction)) * F.col("__n_total") * weight_expr)
        / F.col("__n_s"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    joined = df.join(F.broadcast(counts), source_col)
    return joined.filter(u < frac).select(*df.columns)
