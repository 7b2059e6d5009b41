"""Similarity search over embedding columns (SURVEY §2.7 north-star tier).

The reference never touches vectors (its largest dataset is a 500-row CSV —
``graph_proj/src/agent/dirty_hr.csv``); this tier exists because a 100 TB
training-data pipeline needs ANN over an ``array<float>`` column. Two paths:

- ``topk_cosine``: brute-force exact top-k. Plan: broadcast the query vector
  as a literal → map-side cosine inside the scan stage (higher-order
  functions, whole-stage codegen, no Arrow) → ``TakeOrderedAndProject``.
  ZERO shuffles — each partition keeps its local top-k and the driver merges
  k*numPartitions rows. This is the exact baseline and the verify stage.

- ``topk_cosine_lsh`` / ``similarity_join_lsh``: random-hyperplane LSH.
  Each vector gets a ``num_planes``-bit sign bucket (pure codegen math); a
  query probes its own bucket plus all hamming-distance-1 neighbours (an
  ``IN`` filter the scanner can push down after a one-off bucket
  materialization), then brute-forces only the probed rows. At 1000 executors
  the bucketed table is written once (partitioned/bucketed by ``__bucket``)
  and every query touches ~(planes+1)/2^planes of the data.

Hyperplane components are deterministic pseudo-random values from an explicit
LCG (stable across processes — no ``random`` module).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agent_data_wrangler_spark.functions.vectors import cosine_similarity


def _lcg_gaussianish(n: int, seed: int) -> list[float]:
    """Deterministic plane components in [-1, 1): a simple LCG mapped through
    sin() for decorrelation. Sign-LSH only needs symmetric, roughly isotropic
    directions — exact gaussianity is not required."""
    state = seed & 0xFFFFFFFF
    out: list[float] = []
    for _ in range(n):
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        out.append(math.sin(state))
    return out


def hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    flat = _lcg_gaussianish(dim * num_planes, seed)
    return [flat[i * dim : (i + 1) * dim] for i in range(num_planes)]


def derive_lsh_params(
    n: int, *, target_bucket: int = 64, max_planes: int = 24
) -> tuple[int, int]:
    """Size-derived hyperplane-LSH defaults: ``(num_planes, multiprobe)``.

    ``num_planes = floor(log2(n / target_bucket))`` targets a mean bucket of
    ~``target_bucket`` vectors; multiprobe 2 then probes ``1 + p + C(p,2)``
    buckets. The probed FRACTION shrinks with n: at n=2e3 that is ~11/16
    buckets (embeddings this small have no structure for LSH to exploit —
    probing most of them is the honest operating point, measured recall@10
    >= 0.8 on the near-uniform bench vectors), while at n=1e9 it is
    ~300/8.4M buckets (~0.004%). Callers wanting a different recall/latency
    trade pass explicit values; this is the no-magic-numbers default.
    """
    planes = int(math.floor(math.log2(max(n, 1) / target_bucket))) if n > target_bucket else 1
    return max(1, min(max_planes, planes)), 2


def derive_ivf_params(
    n: int, *, min_probe_rows: int = 1024, max_lists: int = 65536
) -> tuple[int, int]:
    """Size-derived IVF defaults: ``(n_lists, nprobe)``.

    ``n_lists = clamp(sqrt(n), 4, max_lists)`` (the standard coarse-quantizer
    sizing); ``nprobe`` probes enough lists to expect at least
    ``min_probe_rows`` candidate rows, with a ``sqrt(n_lists)/2`` floor so
    large tables still probe a representative list sample. Below ~1k rows the
    derivation probes every list — IVF degenerates to the exact scan, which
    is the correct behavior for a table that small. At n=1e9 it yields
    ~31.6k lists / ~90 probes (~0.3% of rows probed).
    """
    n = max(n, 1)
    n_lists = max(4, min(max_lists, round(math.sqrt(n))))
    rows_per_list = max(1, n // n_lists)
    by_rows = math.ceil(min_probe_rows / rows_per_list)
    by_sample = math.ceil(math.sqrt(n_lists) / 2)
    nprobe = max(2, by_rows, by_sample)
    return n_lists, min(nprobe, n_lists)


def derive_semdedup_params(
    n: int, *, target_cluster: int = 64, max_lists: int = 4096
) -> int:
    """List count for CLUSTER-RESTRICTED DEDUP (SemDeDup, sd1): target a
    FIXED cluster size, not the serving layout's ``sqrt(n)``.

    The two sizings optimize different things. A serving layout wants
    ``sqrt(n)`` lists (balance probe count vs list scan); a dedup pass pays
    ``rows_per_cluster`` comparisons PER ROW, so sqrt(n) sizing makes the
    within-cluster self-join ``n^1.5`` total — measured superlinear
    (18.8x at 10x data) on the near-uniform bench embeddings, where nothing
    collapses clusters below their balanced size. ``n / target_cluster``
    lists make the join ``n * target_cluster`` — linear.

    ``max_lists`` is the single-level quantizer's honest bound: the Lloyd
    fit runs on a bounded driver sample, which cannot produce more distinct
    centroids than sample rows (callers must raise ``max_fit_rows`` to match
    — _staged_ivf_dedup passes 8192). Beyond ``max_lists * target_cluster``
    rows (~262k at the defaults) cluster sizes grow again — at sf10 (500k) the
    cap is measured FASTER than matching lists exactly (58 s vs 65 s: list-file
    fan-out overhead beats the saved comparisons); the engine's scale
    path there is the fit-free hyperplane-LSH bucketing
    (:func:`similarity_join_lsh` / the sd2 quantizer), whose bucket count
    grows with n by construction.
    """
    n = max(n, 1)
    return max(4, min(max_lists, round(n / target_cluster)))


def _lit_double_array(values: Sequence[float]) -> Column:
    """Literal array<double> built as ONE parsed expression instead of one
    py4j ``F.lit`` round-trip per element (r14-opt, guide §1.2 driver cost:
    the PQ ADC LUT alone is m*ksub = 1024 elements, and per-element
    construction measured ~0.6 s of pure plan-build time per query vs
    ~0.02 s through the parser). ``repr`` emits the shortest round-tripping
    decimal and the ``D`` suffix pins the SQL literal to DOUBLE, so the
    parsed values are bit-identical to the ``F.lit(float(v))`` form
    (verified over denormal/huge/accumulated-error cases). Non-finite
    values fall back to the per-element form, which handles them."""
    vals = [float(v) for v in values]
    if all(math.isfinite(v) for v in vals):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


def _dot_literal(vec_col: Column, plane: Sequence[float]) -> Column:
    """vec · literal-plane. The literal array is a foldable expression —
    Catalyst constant-folds it once; the zip_with+aggregate fold stays in
    whole-stage codegen."""
    lit_plane = _lit_double_array(plane)
    return F.aggregate(
        F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec_col: Column | str, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bucket id: bit i = (vec · plane_i >= 0). int in [0, 2^planes)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        bucket = bucket + F.when(_dot_literal(c, plane) >= 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def _query_literal(query_vec: Sequence[float]) -> Column:
    return _lit_double_array(query_vec)


def topk_cosine(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    Ordering ties break by the first payload column ascending (deterministic).
    The score is rounded to 6 decimals AFTER ordering, so boundary rows are
    selected on full precision.
    """
    cols = list(payload_cols) if payload_cols is not None else [c for c in df.columns if c != vec_col]
    score = cosine_similarity(F.col(vec_col), _query_literal(query_vec))
    ranked = (
        df.select(*cols, score.alias("__score"))
        .orderBy(F.desc("__score"), F.asc(cols[0]))
        .limit(k)
    )
    return ranked.select(*cols, F.round(F.col("__score"), 6).alias(score_col))


def probe_buckets(
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    multiprobe: int = 1,
) -> list[int]:
    """The query's sign bucket plus all hamming-<=``multiprobe`` neighbours
    — the literal probe set every LSH read path filters on."""
    num_planes = len(planes)
    qbits = 0
    for i, plane in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if dot >= 0:
            qbits += 2**i
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(num_planes)}
    if multiprobe >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        }
    return sorted(int(p) for p in probes)


def topk_cosine_lsh(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    num_planes: int | None = None,
    seed: int = 7,
    multiprobe: int | None = None,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """Approximate top-k: probe the query's sign bucket ± hamming-`multiprobe`
    neighbours, brute-force only the probed rows.

    With the bucket column persisted (``write_lsh_bucketed`` +
    ``topk_cosine_lsh_pruned``) the probe becomes a partition-PRUNED read;
    computed inline here, it still skips the cosine for ~all rows.

    ``num_planes``/``multiprobe`` default to ``derive_lsh_params(count)`` —
    one cheap count job; pass both explicitly to skip it.
    """
    if num_planes is None or multiprobe is None:
        d_planes, d_probe = derive_lsh_params(df.count())
        num_planes = d_planes if num_planes is None else num_planes
        multiprobe = d_probe if multiprobe is None else multiprobe
    planes = hyperplanes(len(query_vec), num_planes, seed)
    probes = probe_buckets(query_vec, planes, multiprobe)
    bucketed = df.withColumn("__bucket", lsh_bucket(vec_col, planes))
    probed = bucketed.filter(F.col("__bucket").isin(probes)).drop("__bucket")
    return topk_cosine(probed, vec_col, query_vec, k, payload_cols=payload_cols, score_col=score_col)


def write_lsh_bucketed(
    df: DataFrame,
    vec_col: str,
    path: str,
    *,
    num_planes: int | None = None,
    seed: int = 7,
    partition_bits: int = 10,
) -> tuple[int, int]:
    """Write the ANN SERVING layout: parquet partitioned by the hyperplane
    sign bucket, so a later query READS only its probe buckets — partition
    pruning at the source, the real 100 TB shape (the inline
    ``topk_cosine_lsh`` still scans everything to compute buckets).

    Directory fan-out is capped at ``2^partition_bits`` partitions: the
    partition key is the bucket's HIGH ``partition_bits`` bits, the full
    bucket stays as a data column (its ``IN`` filter pushes down to parquet
    row-group stats). At 23 derived planes, partitioning on the raw bucket
    would mean 8.4M directories — a filesystem/metastore non-starter; a
    10-bit prefix keeps ~1024 partitions with ~1/1024 pruning, and the
    remaining 2^13 in-partition buckets prune via row groups.

    Returns ``(num_planes, shift)`` — the reader needs both.
    """
    if num_planes is None:
        num_planes = derive_lsh_params(df.count())[0]
    # NULL-safe dim sniff: F.size(NULL) is NULL (int(None) would raise), and
    # the first physical row may legitimately carry a NULL embedding.
    first = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("n")).limit(1).collect()
    )
    dim = int(first[0]["n"]) if first else 0
    planes = hyperplanes(dim, num_planes, seed)
    shift = max(0, num_planes - partition_bits)
    out = df.withColumn("__bucket", lsh_bucket(vec_col, planes)).withColumn(
        "__bpart", F.shiftright(F.col("__bucket"), shift)
    )
    # Repartition ON the partition key before the partitioned write: without
    # it every write task emits one file per partition directory it touches
    # (tasks x dirs files — measured 130k+ files on a 4096-dir layout, and a
    # full-layout scan then pays ~27 s of per-file open overhead). With it,
    # each directory's rows live in one task -> one file per directory.
    out.repartition("__bpart").write.mode("error").partitionBy("__bpart").parquet(path)
    # Per-partition [count, xor-checksum] sidecar — the LSH twin of the IVF
    # layout's freshness stats (audit_lsh_layout). __bucket is INCLUDED in
    # the checksum columns: it is a stored data column here, so an in-place
    # bucket rewrite (count-invisible, probe-poisoning) must trip the audit.
    checksum_cols = list(df.columns) + ["__bucket"]
    _write_index_meta(
        path, kind="lsh",
        num_planes=num_planes, shift=shift, seed=seed, dim=dim,
        checksum_cols=checksum_cols,
        list_stats=_list_stats(out, checksum_cols, part_col="__bpart"),
        schema_json=out.schema.json(),
    )
    return num_planes, shift


def _require_uniform_dim(
    df: DataFrame, vec_col: str, dim: int, path: str
) -> None:
    """Reject a delta unless EVERY non-null vector has the layout's dim.

    Sampling one row is not a guard: a mixed-dim delta passes the sample,
    then every short vector's plane/centroid dot folds to NULL and the row
    lands in bucket 0 — permanently invisible to pruned probes, with no
    error anywhere (the exact 'silently poison probes' failure the append
    paths document preventing). One aggregate over the delta; the append
    already scans it to write.
    """
    counts = df.agg(
        F.count(F.when(F.col(vec_col).isNotNull(), 1)).alias("nn"),
        F.count(
            F.when(
                F.col(vec_col).isNotNull() & (F.size(vec_col) != dim), 1
            )
        ).alias("bad"),
    ).collect()[0]
    if counts["bad"]:
        raise ValueError(
            f"delta has {counts['bad']} embedding(s) with dim != layout dim "
            f"{dim} at {path}"
        )
    if counts["nn"] == 0:
        raise ValueError(
            f"delta has no non-null {vec_col!r} vectors to append at {path}"
        )


def _strip_nullability(dt):
    """Recursively normalize away nullability flags (nullable /
    containsNull / valueContainsNull) so type comparison is structural.
    A parquet-sourced frame and a createDataFrame/Arrow-sourced frame
    routinely disagree ONLY on these flags while holding identical data —
    rejecting that pair would both be wrong and produce an error message
    whose two simpleString() sides read identically."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, ArrayType):
        return ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def _require_schema_compatible(df: DataFrame, meta: dict, path: str) -> None:
    """Reject a delta whose column TYPES diverge from the layout's recorded
    ``schema_json``. Missing columns are fine (the append null-fills and the
    schema-stable read null-fills symmetrically), but a same-named column
    with a different type would append successfully and only blow up later
    inside ``_read_layout``'s explicit-schema parquet read at probe/audit
    time — a deferred, confusing failure. Fail at append time instead,
    mirroring the ``_require_uniform_dim`` guard. Types are compared
    nullability-normalized (``_strip_nullability``) — nested
    containsNull/valueContainsNull differences are representation noise,
    not divergence. Analysis-time only (no job)."""
    import json

    from pyspark.sql.types import StructType

    if not meta.get("schema_json"):
        return
    recorded = {
        f.name: f.dataType
        for f in StructType.fromJson(json.loads(meta["schema_json"])).fields
    }
    bad = [
        f"{f.name}: delta {f.dataType.json()} != layout "
        f"{recorded[f.name].json()}"
        for f in df.schema.fields
        if f.name in recorded
        and _strip_nullability(f.dataType) != _strip_nullability(recorded[f.name])
    ]
    if bad:
        raise ValueError(
            f"delta column types diverge from the layout schema at {path}: "
            + "; ".join(bad)
        )


def append_lsh_bucketed(df: DataFrame, vec_col: str, path: str) -> int:
    """Append a delta batch into an existing ``write_lsh_bucketed`` layout —
    the daily-ingestion maintenance path (100 TB serving layouts are
    append-mostly, never write-once). The delta is bucketed with the SAME
    planes, reconstructed deterministically from the sidecar metadata
    (dim, num_planes, seed), so new rows land in their correct partition
    directories and every existing probe's partition pruning keeps holding —
    no recompaction required for correctness.

    Raises if the delta's embedding dimension disagrees with the fitted
    layout (bucketing garbage would silently poison probes).

    Returns the number of rows appended.
    """
    meta = read_index_meta(path)
    if meta.get("kind") != "lsh":
        raise ValueError(f"{path} is not an LSH-bucketed layout: {meta}")
    _require_schema_compatible(df, meta, path)
    _require_uniform_dim(df, vec_col, int(meta["dim"]), path)
    planes = hyperplanes(meta["dim"], meta["num_planes"], meta["seed"])
    out = df.withColumn("__bucket", lsh_bucket(vec_col, planes)).withColumn(
        "__bpart", F.shiftright(F.col("__bucket"), meta["shift"])
    )
    n = out.count()
    # one file per touched directory per append batch (see write_lsh_bucketed)
    out.repartition("__bpart").write.mode("append").partitionBy("__bpart").parquet(path)
    # Merge the delta's per-partition stats (same contract as the IVF
    # append: xor checksums compose by xor, counts by addition; schema-
    # subset deltas are checksummed the way the audit re-reads them —
    # null-filled). Pre-stats layouts stay stat-less.
    if "list_stats" in meta:
        stats_in = out
        for c in meta["checksum_cols"]:
            if c not in stats_in.columns:
                stats_in = stats_in.withColumn(c, F.lit(None).cast("string"))
        merged = dict(meta["list_stats"])
        for lid, (dn, dxs) in _list_stats(
            stats_in, meta["checksum_cols"], part_col="__bpart"
        ).items():
            n0, xs0 = merged.get(lid, [0, 0])
            merged[lid] = [n0 + dn, xs0 ^ dxs]
        meta["list_stats"] = merged
        _write_index_meta(path, **meta)
    return n


def append_ivf_partitioned(df: DataFrame, vec_col: str, path: str) -> int:
    """Append a delta batch into an existing ``write_ivf_partitioned``
    layout using the sidecar centroids — new rows are assigned to their
    nearest existing inverted list, so probe-side partition pruning keeps
    holding. Centroids are NOT refit (the standard IVF maintenance trade:
    assignment drift accumulates until a periodic re-fit/re-write, which is
    ``write_ivf_partitioned`` on the unioned data).

    Returns the number of rows appended.
    """
    meta = read_index_meta(path)
    if meta.get("kind") != "ivf":
        raise ValueError(f"{path} is not an IVF-partitioned layout: {meta}")
    _require_schema_compatible(df, meta, path)
    _require_uniform_dim(df, vec_col, len(meta["centroids"][0]), path)
    out = df.withColumn("__list", ivf_assign(vec_col, meta["centroids"]))
    n = out.count()
    # one file per touched list per append batch (see write_lsh_bucketed)
    out.repartition("__list").write.mode("append").partitionBy("__list").parquet(path)
    # Keep the freshness sidecar honest: merge the delta batch's per-list
    # stats into the existing ones (xor checksums compose by xor, counts by
    # addition), so audit_ivf_layout stays green across appends. Layouts
    # written before the stats sidecar existed simply stay stat-less.
    if "list_stats" in meta:
        # A schema-subset delta is legal parquet (missing columns read back
        # as NULL under the merged schema), so the delta's checksum must be
        # computed the way the audit will later RE-read those rows:
        # null-fill the absent checksum columns. xxhash64 treats a NULL
        # input as a no-op (the running hash passes through), so the fill
        # type is irrelevant to the checksum value.
        stats_in = out
        for c in meta["checksum_cols"]:
            if c not in stats_in.columns:
                stats_in = stats_in.withColumn(c, F.lit(None).cast("string"))
        merged = dict(meta["list_stats"])
        for lid, (dn, dxs) in _list_stats(stats_in, meta["checksum_cols"]).items():
            n0, xs0 = merged.get(lid, [0, 0])
            merged[lid] = [n0 + dn, xs0 ^ dxs]
        meta["list_stats"] = merged
        _write_index_meta(path, **meta)
    return n


def audit_ivf_layout(spark, path: str, source_df: DataFrame, id_col: str) -> dict:
    """Freshness/consistency audit of a ``write_ivf_partitioned`` serving
    layout against the source table it claims to index — the operational
    gate the pruned ANN queries (n10/n11 shapes) silently assume: a probe
    over a layout missing rows returns confidently-wrong top-k.

    Three independent checks, each distributed (counts / anti-joins /
    per-partition aggregates — no per-row driver work; the only collect is
    the n_lists-bounded stats frame):

    - coverage: ``n_missing`` = source rows absent from the layout (left
      anti on ``id_col``), ``n_orphaned`` = layout rows absent from the
      source (deleted-at-source rows still being served).
    - sidecar integrity: per-list ``[count, xor-checksum]`` recomputed from
      the layout's data files and compared against ``list_stats`` in
      ``_ann_index_meta.json`` — catches partial writes, lost partition
      directories, and hand-edited files even when the source comparison is
      unavailable (at 100 TB the source may be a stream that moved on).
    - counts: ``n_indexed`` vs ``n_source``.

    Returns a plain dict (the audit is a driver-side decision artifact;
    callers embed it in whatever reporting frame they need):
    ``{n_source, n_indexed, n_missing, n_orphaned, stats_ok, fresh_ok}``.
    ``stats_ok`` is None when the layout predates the stats sidecar.
    """
    return _audit_layout(spark, path, source_df, id_col, part_col="__list")


def audit_lsh_layout(spark, path: str, source_df: DataFrame, id_col: str) -> dict:
    """The LSH twin of :func:`audit_ivf_layout`: same three checks
    (coverage anti-joins both directions, per-partition [count,
    xor-checksum] sidecar recomputation, counts) over a
    ``write_lsh_bucketed`` layout, keyed on its ``__bpart`` partition
    directories. The LSH checksum columns include the stored ``__bucket``
    data column, so an in-place bucket rewrite (count-invisible,
    probe-poisoning) trips ``stats_ok`` even when the id coverage is
    intact."""
    meta = read_index_meta(path)
    if meta.get("kind") != "lsh":
        raise ValueError(f"{path} is not an LSH-bucketed layout: {meta}")
    return _audit_layout(spark, path, source_df, id_col, part_col="__bpart")


def _audit_layout(
    spark, path: str, source_df: DataFrame, id_col: str, *, part_col: str
) -> dict:
    meta = read_index_meta(path)
    # Schema-stable read (_read_layout): appended delta batches may be
    # schema subsets, and single-footer inference could then drop a
    # checksum column from the audit's view.
    layout = _read_layout(spark, path, meta)
    n_source = source_df.count()
    n_indexed = layout.count()
    src_ids = source_df.select(id_col)
    lay_ids = layout.select(id_col)
    n_missing = src_ids.join(lay_ids, id_col, "left_anti").count()
    n_orphaned = lay_ids.join(src_ids, id_col, "left_anti").count()
    stats_ok: bool | None = None
    if "list_stats" in meta:
        recomputed = _list_stats(
            layout.select(*meta["checksum_cols"], part_col),
            meta["checksum_cols"],
            part_col=part_col,
        )
        stats_ok = recomputed == {
            k: [int(a), int(b)] for k, (a, b) in meta["list_stats"].items()
        }
    return {
        "n_source": n_source,
        "n_indexed": n_indexed,
        "n_missing": n_missing,
        "n_orphaned": n_orphaned,
        "stats_ok": stats_ok,
        "fresh_ok": (
            n_missing == 0 and n_orphaned == 0 and stats_ok is not False
        ),
    }


_INDEX_META_FILE = "_ann_index_meta.json"


def _write_index_meta(path: str, **meta) -> None:
    """Sidecar index metadata inside the layout directory. The leading
    underscore makes Spark's file index skip it as a data file — the same
    convention as _SUCCESS — so the layout stays self-describing: readers
    need the PATH only, not out-of-band plane/centroid parameters.

    Plain ``open()`` is the local-filesystem path this engine's harness
    uses; a cluster deployment writes the same JSON through the Hadoop
    FileSystem API (the convention — underscore-prefixed sidecar — is
    identical on HDFS/S3)."""
    import json
    import os

    with open(os.path.join(path, _INDEX_META_FILE), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def read_index_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _INDEX_META_FILE), encoding="utf-8") as fh:
        return json.load(fh)


def _read_layout(spark, path: str, meta: dict) -> DataFrame:
    """Schema-stable layout read.

    Appended delta batches may be SCHEMA SUBSETS of the original layout
    (legal parquet — absent columns read back as NULL), and Spark's default
    single-footer schema inference can then nondeterministically pick a
    delta file and drop a column from the view (a probe asking for that
    payload column raises, file-listing-order dependent). Readers therefore
    use the WRITE-TIME schema recorded in the sidecar — zero footer
    sniffing, deterministic at any file count — falling back to
    ``mergeSchema`` (one footer per file) only for layouts written before
    ``schema_json`` existed. Columns a delta may carry BEYOND the recorded
    schema are not served (append does not widen the sidecar schema — a
    widening is a layout rewrite, not an append).
    """
    import json

    from pyspark.sql.types import StructType

    if meta.get("schema_json"):
        schema = StructType.fromJson(json.loads(meta["schema_json"]))
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


def topk_cosine_lsh_pruned(
    spark,
    path: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    num_planes: int | None = None,
    shift: int | None = None,
    seed: int | None = None,
    multiprobe: int = 2,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """Approximate top-k over a ``write_lsh_bucketed`` layout: the probe set
    becomes a partition filter (``__bpart IN (...)`` — pruned at planning
    time, verifiable in the plan's ``PartitionFilters``) plus an exact
    ``__bucket IN (...)`` data filter pushed to parquet row groups. Only the
    probed fraction of the table is ever read.

    Plane parameters default to the layout's sidecar metadata
    (``_ann_index_meta.json``) — the layout is self-describing; pass them
    explicitly only to override."""
    meta = None
    if num_planes is None or shift is None or seed is None:
        meta = read_index_meta(path)
        num_planes = meta["num_planes"] if num_planes is None else num_planes
        shift = meta["shift"] if shift is None else shift
        seed = meta["seed"] if seed is None else seed
    # The layout's planes were drawn at the WRITE-time dim: a wrong-dim
    # query would silently derive unrelated hyperplanes and probe garbage
    # buckets (confidently wrong top-k) — fail fast instead.
    if meta is None:
        try:
            meta = read_index_meta(path)
        except Exception:
            meta = {}
    layout_dim = meta.get("dim")
    if layout_dim and layout_dim != len(query_vec):
        raise ValueError(
            f"query dim {len(query_vec)} != layout dim {layout_dim} at {path}"
        )
    planes = hyperplanes(len(query_vec), num_planes, seed)
    probes = probe_buckets(query_vec, planes, multiprobe)
    parts = sorted({p >> shift for p in probes})
    probed = (
        _read_layout(spark, path, meta)
        .filter(F.col("__bpart").isin(parts) & F.col("__bucket").isin(probes))
        .drop("__bucket", "__bpart")
    )
    return topk_cosine(probed, vec_col, query_vec, k, payload_cols=payload_cols, score_col=score_col)


def ivf_fit_centroids(
    df: DataFrame,
    vec_col: str,
    *,
    n_lists: int = 16,
    seed: int = 7,
    sample_fraction: float | None = None,
    max_fit_rows: int = 4096,
    max_iter: int = 10,
) -> list[list[float]]:
    """IVF coarse quantizer: Lloyd k-means over L2-NORMALIZED vectors (unit
    sphere → euclidean order == cosine order) on a BOUNDED seeded sample.

    This is a fit step, same contract as ``fit_sigma_bounds``: at 100 TB you
    never fit on the full table — a bounded sample (≲ n_lists·256 rows)
    yields centroids within noise of the full fit, the driver-side numpy
    Lloyd loop costs milliseconds, and assignment/probing stay pure map-side
    expressions against the centroid literals. (A pyspark.ml KMeans fit
    spends multi-second job overhead per iteration to compute the same thing
    at this sample size.)"""
    import numpy as np

    from agent_data_wrangler_spark.functions.collections import array_l2_normalize

    src = df.sample(False, sample_fraction, seed) if sample_fraction else df
    # Filter on the RAW column, not the normalized one: an isNotNull filter
    # over the transform alias gets the whole normalize expression
    # substituted into an interpreted filter condition — measured +1.1 s per
    # fit collect at 2000x64 (r13 pq1 bisect). Raw-null and normalized-null
    # rows are the same set (zero vectors aside, which would poison the
    # numpy cast either way).
    rows = (
        src.filter(F.col(vec_col).isNotNull())
        .select(array_l2_normalize(vec_col).alias("__v"))
        .limit(max_fit_rows)
        .collect()
    )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    if x.size == 0:
        raise ValueError("no vectors to fit IVF centroids on")
    n = x.shape[0]
    # deterministic spread init: evenly spaced rows of the sample ordered by
    # their first principal-ish axis (sum of components) — no RNG
    order = np.argsort(x.sum(axis=1), kind="stable")
    k = min(n_lists, n)
    centroids = x[order[np.linspace(0, n - 1, k).astype(int)]].copy()
    for _ in range(max_iter):
        # argmin over |x-c|^2 == argmin over (|c|^2 - 2 x.c): one
        # (n_sample x k) matmul instead of the full (n_sample x k x dim)
        # difference tensor — the tensor form is ~1.5 GB/iteration at the
        # sqrt(n) serving sizing (k=707 at n=500k) and prohibitive at the
        # dedup sizing (k=4096); the matmul form is ~100 MB and numerically
        # the same argmin up to float association on exact ties.
        d2 = (centroids * centroids).sum(axis=1)[None, :] - 2.0 * (x @ centroids.T)
        assign = d2.argmin(axis=1)
        centroids, moved = _lloyd_update(x, assign, centroids)
        if not moved:
            break
    return [[float(v) for v in c] for c in centroids]


def _lloyd_update(x, assign, cent):
    """One vectorized Lloyd centroid update: empty clusters keep their old
    centroid; a cluster only moves when its new mean fails np.allclose
    against the old value (the convergence contract the per-centroid loop
    had). Vectorized via bincount per dimension — the per-centroid Python
    loop was 40k mask+mean iterations at the k=4096 dedup sizing (and 1.2 s
    of the 16-subspace PQ fit, r13 pq1 bisect). Sums are np.bincount
    accumulations rather than ndarray.mean's pairwise reduction — same-code
    determinism holds (the fit is RNG-free), and cross-form float
    association on exact ties is the accepted Lloyd caveat (r12 matmul
    precedent); downstream oracles are recall/planted-copy robust."""
    import numpy as np

    k = len(cent)
    counts = np.bincount(assign, minlength=k).astype(np.float64)
    new = cent.copy()
    nz = counts > 0
    sums = np.empty((k, x.shape[1]), dtype=np.float64)
    for d in range(x.shape[1]):
        sums[:, d] = np.bincount(assign, weights=x[:, d], minlength=k)
    new[nz] = sums[nz] / counts[nz, None]
    close = np.isclose(new, cent).all(axis=1)
    upd = ~close
    if upd.any():
        cent = cent.copy()
        cent[upd] = new[upd]
        return cent, True
    return cent, False


def ivf_assign(
    vec_col: Column | str,
    centroids: Sequence[Sequence[float]],
    *,
    codegen_max_lists: int = 16,
) -> Column:
    """Nearest-centroid list id. Two strategies, same semantics:

    - few lists (<= ``codegen_max_lists``): pure Column expression — scores
      land in ONE array column and the argmax is array_position(max). A
      chained when/otherwise "running best" would embed each score subtree
      exponentially (2^k expression blowup; measured seconds per row batch
      at k=8). Ranking needs only dot(v, c_i)/|c_i|: |v| is constant across
      i and |c_i| is a Python-side literal, so no per-row norms at all.
    - many lists: the literal-expression tree grows O(n_lists * dim) and
      blows past codegen limits (a 65536-list quantizer cannot be an
      expression), so assignment switches to an Arrow-vectorized pandas_udf
      doing ONE numpy matmul per batch against the broadcast centroid
      matrix — still map-side, no shuffle, and the only viable shape at
      real IVF list counts.

    Both take the FIRST (lowest) list id on ties — deterministic. Null
    vectors assign list 0 in the pandas path (their cosine is null, so they
    can never enter a top-k; the codegen path yields the same bucket-0-ish
    irrelevance via null comparisons)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if len(centroids) > codegen_max_lists:
        return _ivf_assign_pandas(c, centroids)
    scores = []
    for centroid in centroids:
        norm = math.sqrt(sum(v * v for v in centroid)) or 1.0
        scores.append(_dot_literal(c, centroid) / F.lit(norm))
    arr = F.array(*scores)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def _ivf_assign_pandas(c: Column, centroids: Sequence[Sequence[float]]) -> Column:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64).T  # dim x k
    norms = np.linalg.norm(cmat, axis=0)
    norms[norms == 0.0] = 1.0

    def assign(s):
        if len(s) == 0:
            return pd.Series([], dtype="int32")
        nulls = s.isna()
        if nulls.any():
            dim = cmat.shape[0]
            s = s.map(lambda v: v if v is not None else [0.0] * dim)
        x = np.array([np.asarray(v, dtype=np.float64) for v in s])
        scores = (x @ cmat) / norms
        out = scores.argmax(axis=1).astype("int32")
        if nulls.any():
            out[nulls.to_numpy()] = 0
        return pd.Series(out)

    # Real annotation objects (not strings): pandas is imported locally, so
    # string hints would not resolve during pandas_udf type inference.
    assign.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "int")(c)


def ivf_assign_multi(
    vec_col: Column | str,
    centroids: Sequence[Sequence[float]],
    *,
    nprobe: int = 2,
    codegen_max_lists: int = 16,
) -> Column:
    """Multi-probe assignment: the ``nprobe`` NEAREST list ids per vector
    (``array<int>``, best first, ties to the lower id — consistent with
    :func:`ivf_assign`, whose result is always element 1).

    This is the recall lever for cluster-restricted operators (SemDeDup-style
    dedup, sd1/sd2): single-probe assignment is blind to near-dup pairs that
    straddle a cluster boundary; writing each vector into its ``nprobe``
    nearest lists (or probing them at query time) catches any pair whose
    probe sets intersect, at ``nprobe``x storage/candidate cost — the
    standard IVF multi-probe trade. Same two-strategy shape as
    :func:`ivf_assign`: pure Column expression for small quantizers (an
    array_sort over (neg-score, id) structs — no 2^k when-chain), Arrow
    batches above ``codegen_max_lists`` (one numpy argsort per batch).
    Null vectors get list 0s (their cosine is NULL; they can never join a
    verified pair)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    nprobe = max(1, min(int(nprobe), len(centroids)))
    if len(centroids) > codegen_max_lists:
        return _ivf_assign_multi_pandas(c, centroids, nprobe)
    entries = []
    for i, centroid in enumerate(centroids):
        norm = math.sqrt(sum(v * v for v in centroid)) or 1.0
        entries.append(
            F.struct(
                (-(_dot_literal(c, centroid) / F.lit(norm))).alias("s"),
                F.lit(i).cast("int").alias("i"),
            )
        )
    ranked = F.slice(F.array_sort(F.array(*entries)), 1, nprobe)
    out = F.transform(ranked, lambda x: x["i"])
    zeros = F.array(*[F.lit(0).cast("int")] * nprobe)
    return F.when(c.isNull(), zeros).otherwise(out)


def _ivf_assign_multi_pandas(
    c: Column, centroids: Sequence[Sequence[float]], nprobe: int
) -> Column:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64).T  # dim x k
    norms = np.linalg.norm(cmat, axis=0)
    norms[norms == 0.0] = 1.0

    def assign(s):
        if len(s) == 0:
            return pd.Series([], dtype=object)
        nulls = s.isna()
        dim = cmat.shape[0]
        xs = s.map(lambda v: v if v is not None else [0.0] * dim)
        x = np.array([np.asarray(v, dtype=np.float64) for v in xs])
        scores = (x @ cmat) / norms
        # stable sort on -score: ties keep ascending list id, matching the
        # codegen path's (s, i) struct sort.
        order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
        out = pd.Series(list(order.astype("int32")))
        if nulls.any():
            out[nulls.to_numpy()] = pd.Series(
                [np.zeros(nprobe, dtype="int32")] * int(nulls.sum()),
                index=out.index[nulls.to_numpy()],
            )
        return out

    assign.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "array<int>")(c)


def topk_cosine_ivf(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    centroids: Sequence[Sequence[float]] | None = None,
    n_lists: int | None = None,
    nprobe: int | None = None,
    seed: int = 7,
    sample_fraction: float | None = None,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """IVF approximate top-k: restrict the brute-force scan to the ``nprobe``
    inverted lists whose centroids are most cosine-similar to the query.

    With the assignment persisted (or the table partitioned by list id) the
    probe is a partition-pruned read of nprobe/n_lists of the data; computed
    inline here, it still skips the full-vector cosine for unprobed rows.
    Recall/latency trades on (n_lists, nprobe) — the standard IVF dials;
    both default to ``derive_ivf_params(count)`` (one cheap count job).
    """
    if n_lists is None or nprobe is None:
        d_lists, d_probe = derive_ivf_params(df.count())
        n_lists = d_lists if n_lists is None else n_lists
        nprobe = d_probe if nprobe is None else nprobe
    if centroids is None:
        centroids = ivf_fit_centroids(
            df, vec_col, n_lists=n_lists, seed=seed, sample_fraction=sample_fraction
        )
    qnorm = math.sqrt(sum(float(v) ** 2 for v in query_vec)) or 1.0
    sims = []
    for i, centroid in enumerate(centroids):
        cnorm = math.sqrt(sum(v * v for v in centroid)) or 1.0
        dot = sum(float(a) * b for a, b in zip(query_vec, centroid))
        sims.append((dot / (qnorm * cnorm), i))
    probe_ids = [i for _, i in sorted(sims, reverse=True)[: max(1, nprobe)]]
    assigned = df.withColumn("__list", ivf_assign(vec_col, centroids))
    probed = assigned.filter(F.col("__list").isin(probe_ids)).drop("__list")
    return topk_cosine(probed, vec_col, query_vec, k, payload_cols=payload_cols, score_col=score_col)


def similarity_join_lsh(
    left: DataFrame,
    right: DataFrame,
    vec_col: str,
    *,
    threshold: float = 0.9,
    num_planes: int | None = None,
    seed: int = 7,
    left_id: str = "id_a",
    right_id: str = "id_b",
    id_col: str | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """Bucketed cosine similarity self/two-table join.

    Both sides get the same hyperplane bucket; the join runs on the bucket id
    (a bigint — compact shuffle), cosine verifies inside the joined pairs.
    Recall is bounded by bucket collisions; raise recall by lowering
    ``num_planes`` (bigger buckets) or unioning over rotated seeds.

    For a self-join pass ``left is right`` and ``id_col`` to emit each pair
    once (id_a < id_b). ``num_planes`` defaults to
    ``derive_lsh_params(left.count())`` — mean bucket ~64 rows, so the
    bucketed self-join stays ~linear in n at any scale.
    """
    if num_planes is None:
        num_planes = derive_lsh_params(left.count())[0]
    planes_cache: list[list[float]] | None = None

    def with_bucket(df: DataFrame) -> DataFrame:
        nonlocal planes_cache
        dim_probe = planes_cache
        if dim_probe is None:
            # Plane dim comes from the first array element count at analysis
            # time; caller vectors must share a fixed dim (enforced upstream).
            size = df.select(F.size(vec_col).alias("n")).limit(1).collect()
            dim = int(size[0]["n"]) if size else 0
            planes_cache = hyperplanes(dim, num_planes, seed)
        return df.withColumn("__bucket", lsh_bucket(vec_col, planes_cache))

    self_join = left is right
    lb = with_bucket(left)
    rb = with_bucket(right) if not self_join else lb
    # Per-ROW norms, not per-pair: array higher-order functions evaluate
    # interpreted (outside whole-stage codegen), so the verify stage's cost
    # is ~(array folds x candidate pairs). Precomputing |v| once per row
    # cuts the per-pair work to the single dot fold — measured ~3x on the
    # bench self-join — and dot/( |a|*|b| ) is the numerically identical
    # expression, just factored.
    from agent_data_wrangler_spark.functions.vectors import dot_product, l2_norm

    # r14-opt (the sd2 lesson): the per-pair dot products run in the
    # bucket join's reduce stage, whose shuffle BYTES are small — AQE's
    # size-based coalescing folds it to 1-2 tasks while the per-task CPU
    # is ~|bucket|² interpreted dots. Pin the join partitioning with an
    # explicit numbered repartition on the bucket key (exempt from AQE
    # coalescing); parallelism is capped by 2^num_planes, the quantizer's
    # own scale lever. Byte-identical output.
    _tgt = left.sparkSession.sparkContext.defaultParallelism
    if self_join:
        key = id_col or left.columns[0]
        a = lb.select(
            F.col(key).alias(left_id), F.col(vec_col).alias("__va"),
            l2_norm(vec_col).alias("__na"), "__bucket",
        ).repartition(_tgt, "__bucket")
        b = lb.select(
            F.col(key).alias(right_id), F.col(vec_col).alias("__vb"),
            l2_norm(vec_col).alias("__nb"), "__bucket",
        ).repartition(_tgt, "__bucket")
        joined = a.join(b, "__bucket").filter(F.col(left_id) < F.col(right_id))
    else:
        a = lb.withColumnRenamed(vec_col, "__va").withColumn("__na", l2_norm("__va"))
        b = rb.withColumnRenamed(vec_col, "__vb").withColumn("__nb", l2_norm("__vb"))
        a = a.repartition(_tgt, "__bucket")
        b = b.repartition(_tgt, "__bucket")
        joined = a.join(b, "__bucket")
    score = dot_product(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        joined.withColumn(score_col, F.round(score, 6))
        .filter(F.col(score_col) >= threshold)
        .drop("__va", "__vb", "__na", "__nb", "__bucket")
    )


def write_ivf_partitioned(
    df: DataFrame,
    vec_col: str,
    path: str,
    *,
    n_lists: int | None = None,
    seed: int = 7,
    sample_fraction: float | None = None,
    max_fit_rows: int = 4096,
) -> list[list[float]]:
    """Write the IVF SERVING layout: the table partitioned by inverted-list
    id, with the fitted centroids in the sidecar metadata — the layout is
    self-describing, a reader needs only the path. Directory fan-out equals
    ``n_lists`` (= ~sqrt(n) derived), which is inherently metastore-safe:
    31.6k partitions at n=1e9, each ~sqrt(n) rows.

    Returns the centroids (also persisted in ``_ann_index_meta.json``).
    """
    if n_lists is None:
        n_lists = derive_ivf_params(df.count())[0]
    centroids = ivf_fit_centroids(
        df, vec_col, n_lists=n_lists, seed=seed,
        sample_fraction=sample_fraction, max_fit_rows=max_fit_rows,
    )
    checksum_cols = list(df.columns)
    out = df.withColumn("__list", ivf_assign(vec_col, centroids))
    # Repartition ON the list id before the partitioned write — without it
    # the build emits (write tasks x n_lists) files and every later
    # full-layout scan pays per-file open overhead for each (measured 130k+
    # files / ~27 s per scan on the 4096-list dedup layout; one file per
    # list cuts the same scan to ~2 s).
    out = out.repartition("__list")
    out.write.mode("error").partitionBy("__list").parquet(path)
    _write_index_meta(
        path, kind="ivf", n_lists=len(centroids), seed=seed, centroids=centroids,
        checksum_cols=checksum_cols,
        list_stats=_list_stats(out, checksum_cols),
        schema_json=out.schema.json(),
    )
    return centroids


def _list_stats(
    assigned: DataFrame, checksum_cols: Sequence[str], *, part_col: str = "__list"
) -> dict:
    """Per-partition ``{partition_id: [row_count, xor_checksum]}`` over an
    assigned frame (``part_col`` present — ``__list`` for IVF layouts,
    ``__bpart`` for LSH ones).

    The checksum is ``bit_xor(xxhash64(checksum_cols...))`` — order-free and
    self-inverse, so (a) it is insensitive to row order within a partition
    (parquet task ordering is not deterministic), and (b) a delta batch's
    stats MERGE into existing ones by plain xor/addition, which is what
    ``append_ivf_partitioned`` relies on. One extra aggregate pass at write
    time; the collect is bounded by n_lists (~sqrt(n), 31.6k lists at n=1e9).
    """
    rows = (
        assigned.groupBy(part_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.bit_xor(F.xxhash64(*checksum_cols)).alias("__xs"),
        )
        .collect()
    )
    return {str(r[part_col]): [int(r["__n"]), int(r["__xs"])] for r in rows}


def topk_cosine_ivf_pruned(
    spark,
    path: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    nprobe: int | None = None,
    centroids: Sequence[Sequence[float]] | None = None,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """Approximate top-k over a ``write_ivf_partitioned`` layout: rank the
    sidecar centroids against the query on the driver (n_lists-sized python
    loop — the coarse quantizer IS small), then read ONLY the ``nprobe``
    nearest list partitions (``__list IN (...)`` PartitionFilter). The
    brute-force cosine runs over the probed fraction alone."""
    if centroids is None:
        centroids = read_index_meta(path)["centroids"]
    qnorm = math.sqrt(sum(float(v) ** 2 for v in query_vec)) or 1.0
    sims = []
    for i, centroid in enumerate(centroids):
        cnorm = math.sqrt(sum(v * v for v in centroid)) or 1.0
        dot = sum(float(a) * b for a, b in zip(query_vec, centroid))
        sims.append((dot / (qnorm * cnorm), i))
    if nprobe is None:
        # match the inline path's derivation so recall contracts carry over:
        # nprobe depends on n, approximated here by n_lists^2 (the sqrt(n)
        # sizing inverted) — exact n is not in the metadata by design (the
        # layout may be appended to).
        nprobe = derive_ivf_params(len(centroids) ** 2)[1]
    probe_ids = [i for _, i in sorted(sims, reverse=True)[: max(1, nprobe)]]
    try:
        layout_meta = read_index_meta(path)
    except Exception:  # explicit-centroid callers may probe sidecar-less dirs
        layout_meta = {}
    probed = (
        _read_layout(spark, path, layout_meta)
        .filter(F.col("__list").isin(probe_ids))
        .drop("__list")
    )
    return topk_cosine(probed, vec_col, query_vec, k, payload_cols=payload_cols, score_col=score_col)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid — "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): compress each L2-normalized vector
# to m sub-codebook ids (here 16 bytes for a 64-dim float vector, 16x), scan
# the COMPRESSED table with an asymmetric-distance (ADC) lookup expression,
# and exactly re-rank only a small shortlist. This is the billion-vector
# memory play that LSH/IVF (bucket pruning) do not give: at 100 TB of
# embeddings the PQ code table is ~6 TB, the ADC pass is a pure codegen
# scan of it, and the re-rank touches `shortlist` full vectors.
# ---------------------------------------------------------------------------
def derive_pq_params(n: int, dim: int) -> tuple[int, int, int]:
    """Size-derived PQ defaults: ``(m, ksub, shortlist)``.

    ``m``: the largest divisor of ``dim`` that is <= 16 (sub-vectors of >= 4
    dims at dim=64); ``ksub = 64`` centroids per sub-codebook (6 bits — the
    near-uniform bench embeddings need fine cells: 16x4-dim/64 measures
    recall@10 = 1.0 with a 100-row re-rank at every SF, where the classic
    8x8-dim/16 measures 0.3); ``shortlist = max(100, sqrt(n))`` — exact
    re-rank cost stays trivial (31.6k full vectors at n=1e9) while the
    shortlist widens as score gaps tighten with n.
    """
    if dim < 1:
        raise ValueError(
            f"derive_pq_params: vector dim must be >= 1, got {dim} "
            "(empty/null embedding column?)")
    m = max(d for d in range(1, min(16, dim) + 1) if dim % d == 0)
    return m, 64, max(100, math.isqrt(max(n, 1)))


def pq_fit_codebooks(
    df: DataFrame,
    vec_col: str,
    *,
    m: int = 16,
    ksub: int = 64,
    max_fit_rows: int = 4096,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Fit m sub-codebooks (ksub centroids each) by Lloyd k-means over the
    sub-blocks of L2-NORMALIZED vectors, on a bounded driver-side sample —
    the same fit contract as ivf_fit_centroids: deterministic (no RNG; the
    spread init orders sample rows by component sum), bounded (<= 4096 rows
    regardless of table size), and milliseconds on the driver while
    encode/score stay distributed."""
    import numpy as np

    from agent_data_wrangler_spark.functions.collections import array_l2_normalize

    # Raw-column null filter before the normalize projection — see
    # ivf_fit_centroids (an isNotNull over the transform alias re-evaluates
    # the normalize inside an interpreted filter; +1.1 s measured).
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(array_l2_normalize(vec_col).alias("__v"))
        .limit(max_fit_rows)
        .collect()
    )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    if x.size == 0:
        raise ValueError("no vectors to fit PQ codebooks on")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        order = np.argsort(sub.sum(axis=1), kind="stable")
        k = min(ksub, len(sub))
        cent = sub[order[np.linspace(0, len(sub) - 1, k).astype(int)]].copy()
        for _ in range(max_iter):
            # r14-opt: assignment needs only argmin_j ||x - c_j||², and the
            # ||x||² term is constant per row — so rank by
            # ||c_j||² − 2·x·c_j via one matmul instead of materializing the
            # (n, ksub, dsub) broadcast-subtract cube (measured ~0.7 s of
            # the 16-book fit). Same argmin up to float association on
            # exact distance ties — the accepted Lloyd caveat this fit
            # already carries (see _lloyd_update docstring, r12 matmul
            # precedent); downstream oracles are recall/planted-copy
            # robust.
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = d2.argmin(axis=1)
            cent, moved = _lloyd_update(sub, assign, cent)
            if not moved:
                break
        books.append([[float(v) for v in c] for c in cent])
    return books


def pq_encode(vec_col: Column | str, codebooks: Sequence[Sequence[Sequence[float]]]) -> Column:
    """Nearest-sub-centroid code per subspace: ``array<int>`` of length m
    (NULL for NULL vectors). Arrow-vectorized pandas_udf — encode is the
    one-time index-BUILD path, and one numpy matmul per (batch, subspace)
    against the broadcast codebooks is the right shape for it (the codegen
    alternative is an O(m·ksub·dsub) literal tree per row — 4096 literal
    dots here, past codegen limits). Encoding normalizes internally, so
    callers pass the raw vector column."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    def encode(s):
        if len(s) == 0:
            return pd.Series([], dtype=object)
        nulls = s.isna()
        dim = m * dsub
        xs = s.map(lambda v: v if v is not None else [0.0] * dim)
        x = np.array([np.asarray(v, dtype=np.float64) for v in xs])
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        x = x / norms
        codes = np.zeros((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            cent = books[j]
            # argmin over |sub - c|^2 == argmax over (dot - |c|^2/2)
            scores = sub @ cent.T - 0.5 * (cent * cent).sum(axis=1)
            codes[:, j] = scores.argmax(axis=1)
        out = pd.Series(list(codes))
        out[nulls.to_numpy()] = None
        return out

    encode.__annotations__ = {"s": pd.Series, "return": pd.Series}
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return pandas_udf(encode, "array<int>")(c)


def pq_adc_score(
    code_col: Column | str,
    codebooks: Sequence[Sequence[Sequence[float]]],
    query_vec: Sequence[float],
) -> Column:
    """Asymmetric-distance score: sum over subspaces of the NORMALIZED
    query's dot with the row's sub-centroid — a pure codegen expression
    (m element_at lookups into m ksub-float literal arrays; the LUT is
    computed once on the driver and constant-folded). Approximates
    cos(query, v) for unit v; ranking-only, so no rounding."""
    q = [float(v) for v in query_vec]
    qn = math.sqrt(sum(v * v for v in q)) or 1.0
    q = [v / qn for v in q]
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    score = F.lit(0.0)
    for j in range(m):
        qsub = q[j * dsub : (j + 1) * dsub]
        lut = [sum(a * b for a, b in zip(cent, qsub)) for cent in codebooks[j]]
        lut_arr = _lit_double_array(lut)
        score = score + F.element_at(lut_arr, F.element_at(c, j + 1) + 1)
    return score


def topk_cosine_pq(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    m: int | None = None,
    ksub: int | None = None,
    shortlist: int | None = None,
    payload_cols: Sequence[str] | None = None,
    score_col: str = "cos_sim",
) -> DataFrame:
    """PQ approximate top-k with exact re-ranking: encode (or accept a
    pre-encoded table via a ``__pq_code`` column), ADC-score the codes with
    a codegen LUT expression, TakeOrderedAndProject the ``shortlist`` best,
    then exact-cosine re-rank only those. Zero shuffles end-to-end: the ADC
    scan is map-side, both top-k's are TakeOrderedAndProject. Defaults come
    from ``derive_pq_params(count, dim)``.

    Output schema matches :func:`topk_cosine` (payload cols + rounded
    ``score_col``) — by construction the re-rank stage IS topk_cosine on
    the shortlist frame."""
    params_n = None
    if shortlist is None or codebooks is None and (m is None or ksub is None):
        params_n = df.count()
    if m is None or ksub is None or shortlist is None:
        probe = df.select(F.size(vec_col).alias("n")).filter(F.col("n").isNotNull()).limit(1).collect()
        dim = int(probe[0]["n"]) if probe else 0
        dm, dk, ds = derive_pq_params(params_n or 0, dim)
        m = dm if m is None else m
        ksub = dk if ksub is None else ksub
        shortlist = ds if shortlist is None else shortlist
    pre_encoded = "__pq_code" in df.columns
    if codebooks is None:
        if pre_encoded:
            raise ValueError(
                "topk_cosine_pq: a pre-encoded __pq_code column requires the "
                "codebooks that produced it — refitting would score the "
                "codes against mismatched centroids")
        codebooks = pq_fit_codebooks(df, vec_col, m=m, ksub=ksub)
    cols = [c for c in (
        list(payload_cols) if payload_cols is not None else df.columns
    ) if c not in (vec_col, "__pq_code")]
    coded = df.filter(F.col(vec_col).isNotNull())
    if not pre_encoded:
        coded = coded.withColumn("__pq_code", pq_encode(vec_col, codebooks))
    short = (
        coded.withColumn("__adc", pq_adc_score("__pq_code", codebooks, query_vec))
        .orderBy(F.desc("__adc"), F.asc(cols[0]))
        .limit(max(int(shortlist), k))
        .select(*cols, vec_col)
    )
    return topk_cosine(short, vec_col, query_vec, k, payload_cols=cols, score_col=score_col)
