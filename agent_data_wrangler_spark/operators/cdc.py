"""Change-data-capture merge operators: net-effect upsert (MERGE) and SCD
Type-2 history building.

The reference's cleaning fixtures are one-shot batch rewrites
(stash/dirty_hr_final_clean_report.txt); a 100 TB pipeline cannot afford a
full rewrite per day, so the Spark-native engine adds the incremental
primitive every warehouse actually runs: apply a keyed changeset
(insert / update / delete, latest-per-key wins) to a base snapshot, and
materialize the change history as validity intervals (SCD Type 2).

Scale notes:

* ``latest_changes`` is ONE shuffle on the key (row_number window over the
  changeset — the changeset, not the base, which in an incremental pipeline
  is orders of magnitude smaller than the snapshot).
* ``apply_changes`` is the classic copy-on-write MERGE shape: base LEFT ANTI
  changed-keys (hash join on the key; broadcastable when the day's changeset
  is small) unioned with the surviving change rows. No window over the base,
  no driver-side state; every exchange carries the key column only plus the
  row payload it must.
* ``scd2_history`` is one window pass (lead over seq per key) over the
  history frame — O(changes), never O(snapshot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: list[str] | str,
    seq_col: str,
    *,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Net effect of a changeset: the single highest-``seq_col`` row per key.

    ``tie_break`` columns (descending) make equal-seq input deterministic;
    default is no tie-break, matching MERGE semantics where the changeset is
    expected to carry a total per-key order.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(seq_col).desc()] + [
        F.col(c).desc() for c in (tie_break or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    *,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """MERGE a changeset into a base snapshot (net-effect, latest-per-key).

    Rows of ``changes`` must carry every ``base`` column plus ``op_col`` and
    ``seq_col``. Per key, only the highest-seq change applies: ``delete_op``
    drops the key; anything else (insert/update alike — upsert semantics)
    replaces or adds the full row. Keys untouched by the changeset pass
    through unchanged. Output schema == ``base`` schema.

    Physical shape: window over the (small) changeset, then one hash
    anti-join base-vs-changed-keys + union with surviving change rows —
    the copy-on-write MERGE plan; the base is never windowed or shuffled
    beyond the key join.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    latest = latest_changes(changes, keys, seq_col, tie_break=tie_break)
    changed_keys = latest.select(*keys)
    untouched = base.join(changed_keys, keys, "left_anti")
    survivors = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    return untouched.unionByName(survivors)


def scd2_history(
    history: DataFrame,
    keys: list[str] | str,
    seq_col: str,
    *,
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: per key, each version row gets the
    next version's ``seq_col`` as its ``end_col`` (NULL = open interval) and
    a ``current_col`` flag. One window pass, shuffled on the key only.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    nxt: Column = F.lead(F.col(seq_col)).over(w)
    return history.withColumn(end_col, nxt).withColumn(
        current_col, F.col(end_col).isNull()
    )
