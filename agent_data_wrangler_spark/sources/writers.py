"""Sinks (S2, S4, S5).

Reference behaviour being re-expressed:
- S2: no-overwrite versioned clean files — "save the cleaned DataFrame to a new
  CSV file ... Never overwrite the original file" (reference:
  graph_proj/src/agent/tool_call_agent.py:139); artifacts show a
  ``_clean``/``_clean_v2`` naming convention;
- S4: text report written next to the data
  (tool_call_agent.py:57-69, ``create_report``);
- S5: run audit log (tool_call_agent.py:188-202, ``final_messages.log``) —
  implemented as the pipeline JSONL event log in plans/pipeline.py.

Scale notes: the engine's native sink is partitioned parquet with
``mode("error")`` (no silent overwrite = the reference's versioning
invariant). Single-file CSV (``coalesce(1)``) exists as an explicit
export-only mode — at 100 TB a single file is a non-starter, so it is opt-in.
"""

from __future__ import annotations

import math
import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def next_version_path(path: str, suffix: str = "clean") -> str:
    """Compute the reference's versioned output name: ``x.csv`` →
    ``x_clean.csv`` → ``x_clean_v2.csv`` → ``x_clean_v3.csv`` ... choosing the
    first name that does not exist (never-overwrite, S2)."""
    base, ext = os.path.splitext(path)
    base = re.sub(rf"_{suffix}(_v\d+)?$", "", base)
    candidate = f"{base}_{suffix}{ext}"
    version = 2
    while os.path.exists(candidate):
        candidate = f"{base}_{suffix}_v{version}{ext}"
        version += 1
    return candidate


def write_versioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    suffix: str = "clean",
    partition_by: tuple[str, ...] = (),
    single_file: bool = False,
) -> str:
    """S2: write a new clean version, never overwriting (mode='error').

    Returns the path actually written. ``single_file=True`` coalesces to one
    output file for reference-parity CSV exports only.
    """
    out = next_version_path(path, suffix=suffix)
    writer_df = df.coalesce(1) if single_file else df
    writer = writer_df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(out)
    elif fmt == "json":
        writer.json(out)  # JSON-lines: one object per line, splittable
    elif fmt == "orc":
        writer.orc(out)  # columnar alternative; same pushdown/pruning story
    elif fmt == "xml":
        # Native XML sink (built into Spark 4, SPARK-44265): one <row>
        # element per record, values escaped by the writer. Interchange/
        # export path only — row-based, not columnar, no pushdown.
        writer.format("xml").option("rowTag", "row").save(out)
    else:
        writer.parquet(out)
    return out


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at WRITE
    time so later equi-joins/aggregations on those columns skip the shuffle
    entirely (both sides bucketed the same way → zero-exchange sort-merge
    join; Spark reads bucket files as pre-shuffled partitions).

    The 100 TB pattern: bucket the big fact tables once on their join key
    (e.g. orders/lineitem on the order key), amortizing one shuffle across
    every downstream query. Bucketing requires ``saveAsTable`` (bucket
    metadata lives in the catalog — plain path writes cannot record it);
    ``path`` makes it an external table at that location instead of a managed
    table under the session warehouse.
    """
    writer = df.write.format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode("error").saveAsTable(table_name)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Range-partitioned, within-file-sorted layout: rows are range-split on
    ``sort_col`` (repartitionByRange samples the column to pick balanced
    boundaries) and each output file is sorted — so every file covers a
    DISJOINT value range and its parquet min/max column statistics become
    maximally selective. A later filter on ``sort_col`` skips whole files at
    planning time (the poor-man's z-order, and the single highest-leverage
    layout decision for a 100 TB time-keyed table).
    """
    (
        df.repartitionByRange(num_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("error")
        .format(fmt)
        .save(path)
    )


def compact(
    spark,
    path: str,
    *,
    target_mb: int = 128,
    fmt: str = "parquet",
    shuffle: bool = False,
    in_place: bool = False,
) -> str:
    """Small-file compaction — the fourth layout tool (with versioned,
    bucketed, and range-sorted writes) a 100 TB pipeline actually runs
    daily: streaming sinks and per-micro-batch writes accrete thousands of
    KB-sized files whose open/footer overhead eventually dominates scans.

    Rewrites the directory into ``ceil(total_bytes / target_mb)`` files.
    ``shuffle=False`` (default) uses ``coalesce`` — a shuffle-free merge of
    scan partitions, the cheap path when input files are roughly even;
    ``shuffle=True`` uses ``repartition`` to also rebalance skewed inputs.

    By default writes a versioned sibling (``{path}_compacted[...]``, the
    S2 never-overwrite convention) and returns its path. ``in_place=True``
    swaps the compacted directory over the original via renames — correct
    on a real filesystem; on object stores without atomic rename, prefer
    the default versioned mode plus a catalog pointer flip.
    """
    # Guard: a flat read+rewrite would FLATTEN hive-partitioned layouts
    # (k=v subdirectories become plain columns, directory pruning is lost)
    # and drop sidecar metadata (e.g. the ANN layouts' _ann_index_meta.json)
    # — with in_place=True that loss would be irrecoverable. Refuse loudly;
    # partitioned layouts need a partition-aware compaction (per-partition
    # rewrite), which is a different operation.
    entries = os.listdir(path)
    part_dirs = [e for e in entries
                 if "=" in e and os.path.isdir(os.path.join(path, e))]
    sidecars = [e for e in entries
                if e.startswith("_") and e not in ("_SUCCESS",)
                and os.path.isfile(os.path.join(path, e))]
    if part_dirs or sidecars:
        raise ValueError(
            f"compact() refuses a partitioned/sidecar layout at {path}: "
            f"partition dirs={part_dirs[:3]} sidecars={sidecars[:3]} — a "
            "flat rewrite would flatten partitioning and drop metadata; "
            "compact each partition directory individually instead"
        )

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS, hidden CRCs — not data
            total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    sized = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    if in_place:
        return _swap_in_place(
            path,
            lambda tmp: sized.write.mode("error").format(fmt).save(tmp),
            tmp_suffix=".__compacting__",
            bak_suffix=".__pre_compact__",
        )
    out = next_version_path(path, suffix="compacted")
    sized.write.mode("error").format(fmt).save(out)
    return out


def _swap_in_place(path, write_tmp, *, tmp_suffix, bak_suffix):
    """The rename-swap protocol shared by ``compact(in_place=True)`` and
    ``recluster_zorder``: write the rewritten layout to a tmp sibling, then
    two renames and a backup delete. A stale tmp from a crashed prior run is
    removed first (the writers use mode('error'), so a leftover would fail
    every retry until manual cleanup); a stale BACKUP is never auto-removed
    — after a crash between the renames it may hold the only copy of the
    data, so it raises with recovery instructions instead. POSIX rename
    semantics; on object stores without atomic rename, write a versioned
    sibling and flip a catalog pointer instead.
    """
    tmp = path.rstrip("/") + tmp_suffix
    bak = path.rstrip("/") + bak_suffix
    if os.path.exists(bak):
        raise RuntimeError(
            f"stale backup {bak} exists — a prior swap crashed mid-rename; "
            f"inspect it (it may hold the only copy) and remove it manually"
        )
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    write_tmp(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return path


def latest_version_path(path: str, suffix: str = "clean") -> str:
    """S3: resolve the newest existing clean version of ``path`` — the
    reference's each-stage-reads-the-latest-output convention
    (tool_call_agent.py:140). Returns the original path when no clean
    version exists yet."""
    base, ext = os.path.splitext(path)
    base = re.sub(rf"_{suffix}(_v\d+)?$", "", base)
    latest = path
    candidate = f"{base}_{suffix}{ext}"
    version = 2
    while os.path.exists(candidate):
        latest = candidate
        candidate = f"{base}_{suffix}_v{version}{ext}"
        version += 1
    return latest


def write_report(report_text: str, data_path: str) -> str:
    """S4: write ``{base}_report.txt`` next to the data, mirroring
    ``create_report`` (tool_call_agent.py:57-69)."""
    base, _ = os.path.splitext(data_path)
    out = f"{base}_report.txt"
    with open(out, "w", encoding="utf-8") as fh:
        fh.write(report_text)
    return out


def recluster_zorder(
    spark,
    path: str,
    cols: list[str],
    num_files: int,
    *,
    bits: int = 16,
    fmt: str = "parquet",
) -> str:
    """Re-cluster a z-ordered layout after appends — the maintenance half of
    ``write_zorder`` (100 TB layouts are append-mostly: deltas land as
    plain appended files whose stats straddle the whole value range, so
    pruning degrades until a periodic re-cluster restores it).

    Reads the full directory (clustered files + appended deltas), rewrites
    it through ``write_zorder`` with FRESH min/max bounds (appends may have
    widened the domain), and swaps in place via ``_swap_in_place`` (shared
    with ``compact``, including its stale-tmp cleanup and crash-recovery
    semantics). Returns ``path``.
    """
    df = spark.read.format(fmt).load(path)
    # write_zorder triggers the fit aggregate + the write, both of which
    # fully materialize from the source before the swap.
    return _swap_in_place(
        path,
        lambda tmp: write_zorder(df, tmp, cols, num_files, bits=bits, fmt=fmt),
        tmp_suffix=".__reclustering__",
        bak_suffix=".__pre_recluster__",
    )


def zorder_key(cols: list, bits: int = 16, *, mins: dict | None = None,
               maxs: dict | None = None):
    """Morton (Z-order) interleave key over 2+ numeric columns, as a pure
    Column expression. Each column is min/max-normalized to a ``bits``-bit
    integer (bounds passed as literals — fit-then-transform), then the bits
    are interleaved so the sort order preserves MULTI-dimensional locality:
    rows close in the z-key are close in every dimension at once.
    """
    names = list(cols)
    # NULL cell values map to bucket 0 (explicitly, below): NULL rows cluster
    # together at the low end of the curve instead of scattering, so IS NULL
    # predicates still skip files. Spark's least/greatest SKIP nulls rather
    # than propagate them, so without the explicit coalesce a NULL cell would
    # silently land in the TOP bucket via least(max, NULL) = max.
    if bits * len(names) > 63:
        # Bit 63 is bigint's sign bit: an interleave that reaches it makes
        # high-order rows sort NEGATIVE (before everything), splitting the
        # curve at the wrong place; positions >= 64 wrap mod 64 and corrupt
        # the key outright. Callers should lower `bits` (write_zorder does
        # this automatically).
        raise ValueError(
            f"bits*k = {bits * len(names)} exceeds 63 (bigint sign bit): "
            f"use bits <= {63 // len(names)} for {len(names)} columns"
        )
    for c in names:
        # An all-NULL column (or empty input) fits min/max of None — a key
        # built from it would be meaningless, so fail with the cause, not a
        # TypeError deep in float().
        if mins.get(c) is None or maxs.get(c) is None:
            raise ValueError(
                f"z-order column {c!r} has no non-null values to fit "
                "min/max bounds on (all-NULL column or empty input)"
            )
    scaled = []
    for c in names:
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        # coalesce BEFORE least/greatest: Spark's least/greatest SKIP nulls,
        # so least(max, NULL) = max would put NULL cells in the top bucket.
        s = F.least(
            F.lit((1 << bits) - 1),
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                    * F.lit(float((1 << bits) - 1))
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        )
        scaled.append(F.greatest(F.lit(0).cast("bigint"), s))
    k = len(scaled)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    *,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Z-order clustered layout: the multi-column generalization of
    ``write_range_sorted``. Files are range-split on the Morton key and
    sorted within, so EVERY clustered column's per-file min/max statistics
    are narrow simultaneously — predicates on any subset of ``cols`` skip
    files at planning time. This is the data-skipping layout for tables
    queried along several independent dimensions (time AND tenant AND
    region), where a single-column range sort helps only one of them.

    Cost model: min/max fit is one aggregate; the key is a scan-stage
    expression; the write is one range shuffle — same bill as a plain
    range-sorted rewrite. Locality degrades ~√k per extra dimension; keep
    ``cols`` to 2-4.
    """
    # Clamp so the interleave never reaches bigint's sign bit (bit 63) —
    # 4 columns get 15 bits each, 2 columns keep the full 16.
    bits = min(bits, 63 // len(cols))
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).first()
    mins = {c: row[f"__lo_{c}"] for c in cols}
    maxs = {c: row[f"__hi_{c}"] for c in cols}
    z = zorder_key(cols, bits, mins=mins, maxs=maxs)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("error")
        .format(fmt)
        .save(path)
    )
