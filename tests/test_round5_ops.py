"""Unit pins for the second round-5 batch: rolling anomaly flags, fixed-width
histogram, mixture sampling, ORC roundtrip, and the stream-stream interval
join."""

from __future__ import annotations

import datetime
import os

import pytest

from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators.profile import histogram
from agent_data_wrangler_spark.operators.splits import mixture_sample
from agent_data_wrangler_spark.operators.windows import rolling_anomaly


def test_rolling_anomaly_flags_planted_spike(spark):
    # 12 calm values then a spike; the spike's frame excludes itself.
    rows = [("u", i, 100 + (i % 3)) for i in range(12)] + [("u", 12, 10000)]
    df = spark.createDataFrame(rows, "g string, i int, v long")
    out = rolling_anomaly(
        df, "v", partition_by=["g"], order_by=[F.col("i").asc()],
        lookback=10, min_history=5, k=3.0,
    )
    flags = {r["i"]: r["is_anomaly"] for r in out.collect()}
    assert flags[12] is True
    assert not any(flags[i] for i in range(12))


def test_rolling_anomaly_needs_history(spark):
    # A wild second value cannot be flagged: only 1 row of history (< 5).
    df = spark.createDataFrame(
        [("u", 1, 100), ("u", 2, 99999)], "g string, i int, v long"
    )
    out = rolling_anomaly(
        df, "v", partition_by=["g"], order_by=[F.col("i").asc()], min_history=5
    )
    assert all(r["is_anomaly"] is False for r in out.collect())


def test_histogram_buckets_and_bounds(spark):
    df = spark.createDataFrame(
        [(0.5,), (1.5,), (1.7,), (None,), (3.2,)], "x double"
    )
    out = {r["bucket"]: (r["lo"], r["hi"], r["n"])
           for r in histogram(df, "x", bucket_width=1.0).collect()}
    assert out == {0: (0.0, 1.0, 1), 1: (1.0, 2.0, 2), 3: (3.0, 4.0, 1)}


def test_mixture_sample_deterministic_and_weighted(spark):
    rows = [(i, "a" if i < 400 else "b") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"a": 0.5, "b": 0.5}
    s1 = mixture_sample(df, "source", "doc_id", weights, target_fraction=0.4)
    s2 = mixture_sample(df, "source", "doc_id", weights, target_fraction=0.4)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())  # exact replay
    per = {r["source"]: r["n"] for r in
           s1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # target per source = 0.4 * 500 * 0.5 = 100; source b has exactly 100
    # rows -> fraction 1.0 keeps ALL of b; a is thinned toward ~100.
    assert per["b"] == 100
    assert 60 <= per["a"] <= 140  # md5-uniform around 100, loose bound


def test_mixture_sample_zero_weight_drops_source(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(50)] + [(i + 100, "junk") for i in range(50)],
        "doc_id long, source string",
    )
    out = mixture_sample(df, "source", "doc_id", {"a": 1.0}, target_fraction=1.0)
    assert {r["source"] for r in out.collect()} == {"a"}
    assert out.count() == 50  # fraction clamps at 1.0, all of a kept


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    from agent_data_wrangler_spark.sources.readers import read_orc
    from agent_data_wrangler_spark.sources.writers import write_versioned

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", None)], "id long, s string, v double"
    )
    out = write_versioned(df, os.path.join(str(tmp_path), "t.orc"), fmt="orc")
    back = read_orc(spark, out)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == [(1, "x", 1.5), (2, "y", None)]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """AvailableNow-drained stream-stream interval join equals the batch
    join on the same (complete) data."""
    from agent_data_wrangler_spark.streaming import (
        run_available_now,
        stream_from_directory,
        stream_interval_join,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2):
        for m in (0, 10, 200):
            rows.append((u, "A", t0 + datetime.timedelta(minutes=m)))
        for m in (5, 30, 205):
            rows.append((u, "B", t0 + datetime.timedelta(minutes=m)))
    df = spark.createDataFrame(rows, "user long, kind string, ts timestamp")
    path = os.path.join(str(tmp_path), "events")
    df.repartition(2).write.parquet(path)

    src = lambda: stream_from_directory(spark, path, df.schema)  # noqa: E731
    a = src().filter(F.col("kind") == "A").select(
        F.col("user").alias("a_user"), F.col("ts").alias("a_ts"))
    b = src().filter(F.col("kind") == "B").select(
        F.col("user").alias("b_user"), F.col("ts").alias("b_ts"))
    joined = stream_interval_join(
        a, b, [("a_user", "b_user")], left_time="a_ts", right_time="b_ts",
        max_delay="1 HOUR", watermark="3650 days",
    )
    run_available_now(
        joined, "ssj_out", os.path.join(str(tmp_path), "ckpt")
    )
    got = sorted(tuple(r) for r in spark.table("ssj_out").collect())

    batch = df.filter(F.col("kind") == "A").alias("x").join(
        df.filter(F.col("kind") == "B").alias("y"),
        (F.col("x.user") == F.col("y.user"))
        & (F.col("y.ts") >= F.col("x.ts"))
        & (F.col("y.ts") <= F.col("x.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(F.col("x.user"), F.col("x.ts"), F.col("y.user"), F.col("y.ts"))
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(want) > 0


def test_merge_partial_aggregates_equals_full(spark):
    from agent_data_wrangler_spark.operators.aggregates import (
        merge_partial_aggregates,
    )

    df = spark.createDataFrame(
        [("a", i, i * 10) for i in range(6)] + [("b", i, i) for i in range(4)],
        "k string, epoch int, v long",
    )
    full = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    parts = [
        df.filter(F.col("epoch") < 3).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")),
        df.filter(F.col("epoch") >= 3).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")),
    ]
    merged = merge_partial_aggregates(parts, ["k"], ["n", "s"])
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_fk_orphans_planted_and_null_exempt(spark):
    from agent_data_wrangler_spark.operators.validate import fk_orphan_counts

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = fk_orphan_counts(child, [("fk", parent, "pk")]).collect()[0]
    # id=3 is an orphan; id=4's NULL key is NOT (SQL FK semantics).
    assert out["orphans_fk"] == 1


def test_chi2_contingency_independent_uniform(spark):
    from agent_data_wrangler_spark.operators.pivot import chi2_contingency

    # Perfectly independent 2x2 with equal counts: expected == observed,
    # contribution == 0 in every cell.
    rows = [(a, b) for a in ("x", "y") for b in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b int")
    out = chi2_contingency(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["observed"] == 5
        assert r["expected"] == 5.0
        assert r["contribution"] == 0.0


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-order files must have narrow per-file min/max spans on BOTH
    clustered columns; a single-column range sort only narrows its own."""
    import glob

    from agent_data_wrangler_spark.sources.writers import (
        write_range_sorted,
        write_zorder,
    )

    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x int, y int"
    )
    zpath = os.path.join(str(tmp_path), "z")
    rpath = os.path.join(str(tmp_path), "r")
    write_zorder(grid, zpath, ["x", "y"], num_files=16, bits=8)
    write_range_sorted(grid, rpath, "x", num_files=16)

    def mean_span(path, col):
        spans = []
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            agg = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")).first()
            spans.append(agg["hi"] - agg["lo"])
        return sum(spans) / len(spans)

    # 16 files over a 64x64 grid: ideal z-order tiles are 16x16 -> span ~16
    # per dim. Allow generous slack; the x-only sort leaves y unclustered
    # (span ~63 per file).
    assert mean_span(zpath, "x") < 32 and mean_span(zpath, "y") < 32
    assert mean_span(rpath, "y") > 48  # the contrast the z-layout buys


def test_python_datasource_partitions_and_rows(spark):
    """The custom connector reads with one task per declared shard, and its
    rows are the deterministic integer-arithmetic values the oracle mirrors."""
    from agent_data_wrangler_spark.sources import python_datasource

    python_datasource.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("shards", 3).option("rows_per_shard", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one task per InputPartition
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 12
    assert rows[7]["shard"] == 1 and rows[7]["payload"] == "doc-7"
    assert rows[7]["score_milli"] == (7 * 2654435761) % 1000


def test_rolling_anomaly_int_column_no_overflow(spark):
    """int32 cents whose square exceeds int32 range must not overflow
    (the square is widened to 64-bit before summing)."""
    rows = [("u", i, 50000 + (i % 3)) for i in range(8)] + [("u", 8, 3000000)]
    df = spark.createDataFrame(rows, "g string, i int, v int")  # int32!
    out = rolling_anomaly(
        df, "v", partition_by=["g"], order_by=[F.col("i").asc()], min_history=5
    )
    flags = {r["i"]: r["is_anomaly"] for r in out.collect()}
    assert flags[8] is True and not any(flags[i] for i in range(8))


def test_zorder_key_rejects_sign_bit_and_write_clamps(spark, tmp_path):
    import pytest as _pytest

    from agent_data_wrangler_spark.sources.writers import write_zorder, zorder_key

    with _pytest.raises(ValueError, match="sign bit"):
        zorder_key(["a", "b", "c", "d"], bits=16,
                   mins={c: 0.0 for c in "abcd"}, maxs={c: 1.0 for c in "abcd"})
    # write_zorder clamps bits (4 cols -> 15 bits each) and succeeds.
    df = spark.createDataFrame(
        [(float(i % 8), float(i // 8 % 8), float(i % 5), float(i % 3))
         for i in range(64)],
        "a double, b double, c double, d double",
    )
    write_zorder(df, os.path.join(str(tmp_path), "z4"), ["a", "b", "c", "d"],
                 num_files=4)
    assert spark.read.parquet(os.path.join(str(tmp_path), "z4")).count() == 64


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    import pytest as _pytest

    from agent_data_wrangler_spark.sources.writers import compact

    p = os.path.join(str(tmp_path), "parted")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string") \
        .write.partitionBy("k").parquet(p)
    with _pytest.raises(ValueError, match="partitioned/sidecar"):
        compact(spark, p, in_place=True)


def test_stream_interval_join_rejects_empty_keys(spark):
    import pytest as _pytest

    from agent_data_wrangler_spark.streaming import stream_interval_join

    df = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="key pair"):
        stream_interval_join(df, df, [], left_time="timestamp",
                             right_time="timestamp", max_delay="1 HOUR")


def test_lsh_pruned_layout_rejects_wrong_dim(spark, tmp_path):
    import pytest as _pytest

    from agent_data_wrangler_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0, 0.5]) for i in range(60)],
        "id long, emb array<double>",
    )
    p = os.path.join(str(tmp_path), "lsh")
    similarity.write_lsh_bucketed(df, "emb", p, num_planes=6)
    with _pytest.raises(ValueError, match="dim"):
        similarity.topk_cosine_lsh_pruned(spark, p, "emb", [1.0, 0.0], k=3)


def test_merge_partial_aggregates_guards_empty_and_single(spark):
    """ADVICE r05: empty frames list raises a descriptive error (epoch with
    no delta should skip the merge); a single frame re-aggregates as-is."""
    from agent_data_wrangler_spark.operators.aggregates import merge_partial_aggregates

    with pytest.raises(ValueError, match="at least one partial frame"):
        merge_partial_aggregates([], ["k"], ["s"])
    one = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, s long")
    got = {r.k: r.s for r in merge_partial_aggregates([one], ["k"], ["s"]).collect()}
    assert got == {"a": 3, "b": 3}


def test_zorder_key_rejects_all_null_column_and_buckets_nulls_low(spark, tmp_path):
    """ADVICE r05: an all-NULL clustered column must raise with the cause
    (not a TypeError from float(None)); NULL cells in an otherwise-fittable
    column map to bucket 0 (cluster low), per the documented rule."""
    from agent_data_wrangler_spark.sources.writers import write_zorder, zorder_key

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0)], "x double, y double"
    )
    with pytest.raises(ValueError, match="no non-null values"):
        write_zorder(df, str(tmp_path / "z"), ["x", "y"], num_files=2)

    # NULL cell → bucket 0: key equals the key of the minimum value
    df2 = spark.createDataFrame(
        [(None, 5.0), (0.0, 5.0), (10.0, 5.0)], "x double, y double"
    )
    bounds = dict(mins={"x": 0.0, "y": 5.0}, maxs={"x": 10.0, "y": 5.0})
    keys = [
        r.z for r in df2.select(
            zorder_key(["x", "y"], bits=8, **bounds).alias("z")
        ).collect()
    ]
    assert keys[0] == keys[1]  # NULL clusters with the min, not the max
    assert keys[2] > keys[0]


def test_swap_in_place_cleans_stale_tmp_and_refuses_stale_backup(spark, tmp_path):
    """compact(in_place=True) after a crashed prior attempt: a stale tmp dir
    is removed and the compaction succeeds; a stale BACKUP (which may hold
    the only copy after a mid-rename crash) raises instead of deleting."""
    import os

    import pytest

    from agent_data_wrangler_spark.sources import writers

    path = str(tmp_path / "data")
    spark.range(100).coalesce(4).write.parquet(path)
    stale_tmp = path + ".__compacting__"
    os.makedirs(stale_tmp)
    open(os.path.join(stale_tmp, "junk"), "w").write("x")
    out = writers.compact(spark, path, target_mb=128, in_place=True)
    assert out == path
    assert not os.path.exists(stale_tmp)
    assert spark.read.parquet(path).count() == 100
    os.makedirs(path + ".__pre_compact__")
    with pytest.raises(RuntimeError, match="stale backup"):
        writers.compact(spark, path, target_mb=128, in_place=True)
