"""Data-quality validation rules (expectations) → violations report.

The reference's cleaning loop is validation-driven: every stage report calls
out rows "failing validation" (future dates, out-of-range salaries, malformed
phones — reference: graph_proj/README.md:113 and the stage reports under
graph_proj/src/agent/). This module makes that theme a first-class,
declarative operator: a rule set compiles to ONE aggregate pass over the
table, so a 100-rule suite on 100 TB costs exactly one scan — each rule is a
map-side flag-sum folded by the partial/final hash aggregate, never a
separate job per rule (the classic expectations-framework scale trap).

Rule helpers return aggregate Columns counting VIOLATIONS (bigint). Compose
freely with any custom aggregate expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vsum(flag: Column) -> Column:
    """Violation count; coalesced so an EMPTY table reports 0 violations per
    rule (F.sum over zero rows is NULL, which would read as 'unknown')."""
    return F.coalesce(F.sum(flag), F.lit(0)).cast("bigint")


def not_null(column: str) -> Column:
    """Violations = rows where ``column`` is NULL."""
    return _vsum(F.when(F.col(column).isNull(), 1).otherwise(0))


def in_range(column: str, lo: float, hi: float) -> Column:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(column)
    return _vsum(
        F.when(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))), 1).otherwise(0)
    )


def accepted_values(column: str, values: list) -> Column:
    """Violations = non-null rows whose value is not in ``values``."""
    c = F.col(column)
    return _vsum(F.when(c.isNotNull() & ~c.isin(values), 1).otherwise(0))


def matches(column: str, pattern: str) -> Column:
    """Violations = non-null rows NOT matching the (RE2-ish Java) regex."""
    c = F.col(column)
    return _vsum(F.when(c.isNotNull() & ~c.rlike(pattern), 1).otherwise(0))


def unique(column: str) -> Column:
    """Violations = surplus rows beyond one per distinct non-null value
    (count − count distinct) — expressible inside the same single aggregate
    pass, unlike a groupBy-based duplicate listing."""
    return (F.count(F.col(column)) - F.count_distinct(F.col(column))).cast("bigint")


def check_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Run every rule in ONE aggregate job; returns (rule, n_violations) rows.

    The wide 1-row aggregate is unpivoted with ``stack`` — no second scan, no
    driver-side loop. Rule names must be valid for quoting inside a SQL
    string literal (no single quotes).
    """
    wide = df.agg(*[col.alias(f"__r{i}") for i, (_n, col) in enumerate(rules)])
    pairs = ", ".join(f"'{name}', __r{i}" for i, (name, _c) in enumerate(rules))
    return wide.select(
        F.expr(f"stack({len(rules)}, {pairs}) as (rule, n_violations)")
    )


def fk_orphan_counts(
    child: DataFrame, pairs: list[tuple[str, DataFrame, str]]
) -> DataFrame:
    """Referential-integrity check: one row with, per (child_key, parent,
    parent_key) pair, the number of child rows whose key has no match in the
    parent (NULL child keys are not orphans — SQL FK semantics).

    Mechanism: ONE pass over the child — every parent's distinct keys are
    LEFT-joined (broadcast: parent key sets are dim-sized) onto the same
    child frame, then a single aggregate counts, per edge, the rows whose
    key is present but unmatched. N edges cost one child scan + N broadcast
    builds, not N child scans — the difference between one and N full-table
    reads at 100 TB. Cross-TABLE rules complement the single-scan rule
    suite in :func:`check_rules`, which by design never leaves its one
    table.
    """
    from agent_data_wrangler_spark.operators.joins import _fits_broadcast

    out = child
    marks = []
    for i, (child_key, parent, parent_key) in enumerate(pairs):
        pk = f"__pk_{i}"
        keys = parent.select(F.col(parent_key).alias(pk)).distinct()
        # Broadcast only when the parent's key set is actually dim-sized
        # (Catalyst size estimate under the session threshold) — a forced
        # hint on a fact-table parent (e.g. orders as lineitem's parent)
        # would bypass autoBroadcastJoinThreshold and OOM the driver at
        # scale. Oversized parents fall back to a hash join; AQE may still
        # promote it at runtime if the distinct set shrinks enough.
        if _fits_broadcast(keys):
            keys = F.broadcast(keys)
        out = out.join(keys, out[child_key] == keys[pk], "left")
        marks.append(
            F.sum(
                (F.col(child_key).isNotNull() & F.col(pk).isNull()).cast("long")
            ).cast("bigint").alias(f"orphans_{child_key}")
        )
    return out.agg(*marks)
