"""Unit tests for the operator library on tiny inline DataFrames, including
the reference's golden invariants that are checkable without its data files
(FIXTURES.md expected-output invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from agent_data_wrangler_spark.functions.dates import to_date_multi
from agent_data_wrangler_spark.functions.strings import normalize_bool, normalize_phone
from agent_data_wrangler_spark.operators import filters, impute, joins, profile, transform


def test_null_counts_single_pass(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=None, b="x"), Row(a=3, b=None)]
    )
    res = {r["column"]: r["null_count"] for r in profile.null_counts(df).collect()}
    assert res == {"a": 1, "b": 2}


def test_describe_uses_sample_stddev(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    row = profile.describe_numeric(df, ["x"]).collect()[0]
    assert row["std"] == pytest.approx(1.0)  # ddof=1 -> 1.0 (pop would be 0.816)
    assert row["p50"] == pytest.approx(2.0)


def test_sigma_filter_keeps_nulls_and_inliers(spark):
    vals = [(float(i),) for i in range(1, 11)] + [(1000.0,), (None,)]
    df = spark.createDataFrame(vals, "x double")
    kept = filters.sigma_outlier_filter(df, ["x"], k=3.0).collect()
    xs = sorted((r.x for r in kept if r.x is not None))
    assert 1000.0 not in xs and len(kept) == 11  # 10 inliers + null row


def test_median_mean_mode_fill(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (None,)], "x double")
    assert impute.fill_median(df, ["x"]).agg(F.sum("x")).first()[0] == pytest.approx(8.0)
    assert impute.fill_mean(df, ["x"]).agg(F.sum("x")).first()[0] == pytest.approx(8.0)
    modal = spark.createDataFrame([("a",), ("b",), ("b",), ("a",), (None,)], "s string")
    assert impute.fit_mode(modal, "s") == "a"  # tie a/b -> ascending wins


def test_mean_fill_preserves_exact_mean(spark):
    # the reference's artifact invariant: filled value == pre-fill column mean
    # (stash/dirty_hr_clean.csv:2 = 74746.78752711497)
    vals = [(74746.78752711497 * 3 - 50000.0 - 90000.0,), (50000.0,), (90000.0,), (None,)]
    df = spark.createDataFrame(vals, "salary double")
    filled = impute.fill_mean(df, ["salary"])
    got = filled.filter(F.col("salary").isNotNull()).count()
    assert got == 4
    mean_after = filled.agg(F.avg("salary")).first()[0]
    assert mean_after == pytest.approx(74746.78752711497)


def test_cap_percentile(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    capped = impute.cap_percentile(df, ["x"], p=0.95)
    assert capped.agg(F.max("x")).first()[0] == pytest.approx(95.05)


def test_dual_format_dates(spark):
    df = spark.createDataFrame(
        [("2023-05-08",), ("05/08/2023",), ("garbage",), (None,)], "d string"
    )
    out = df.select(to_date_multi("d").alias("p")).collect()
    parsed = [r.p.isoformat() if r.p else None for r in out]
    assert parsed == ["2023-05-08", "2023-05-08", None, None]


def test_normalize_bool_and_phone(spark):
    df = spark.createDataFrame(
        [("Y", "035-721-9686"), ("no", "(673)260-2673"), ("Yes", "1811968548"),
         ("?", "+1-079-220-1256x89001")],
        "b string, p string",
    )
    rows = df.select(normalize_bool("b").alias("b"), normalize_phone("p").alias("p")).collect()
    assert [r.b for r in rows] == [True, False, True, None]
    assert [r.p for r in rows] == [
        "0357219686", "6732602673", "1811968548", "10792201256x89001"
    ]


def test_canonicalize_map_and_case(spark):
    df = spark.createDataFrame(
        [(" Germny",), ("canada",), ("U.K.",), ("USA",)], "country string"
    )
    canon = transform.canonicalize_map(
        df, "country",
        {"germny": "Germany", "canada": "Canada", "u.k.": "UK", "usa": "USA"},
    )
    assert sorted(r.country for r in canon.collect()) == ["Canada", "Germany", "UK", "USA"]


def test_dedup_exact_reference_invariant(spark):
    # customers_dirty exact-dedup removes exactly the duplicated rows
    rows = [(i, f"n{i}") for i in range(200)] + [(i, f"n{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, name string")
    assert profile.duplicate_row_count(df) == 5
    assert filters.drop_duplicate_rows(df).count() == 200


def test_golden_replay_hr_pipeline_shape(spark):
    """FIXTURES.md invariant shape: drop-null-promo + 3-sigma keeps the clean
    core; verified here structurally on a miniature of the hr table."""
    rows = []
    for i in range(100):
        promo = None if i % 10 == 0 else "2020-01-01"  # 10% null promo
        age = 500.0 if i == 5 else 30.0 + (i % 7)  # one wild outlier
        rows.append((1000 + i, age, promo))
    df = spark.createDataFrame(rows, "employee_id long, age double, last_promo_date string")
    step1 = filters.drop_null_rows(df, ["last_promo_date"])
    step2 = filters.sigma_outlier_filter(step1, ["age"], k=3.0)
    assert step1.count() == 90
    assert step2.count() == 89  # outlier removed
    # idempotence: re-cleaning changes nothing
    assert filters.drop_null_rows(step2, ["last_promo_date"]).count() == 89


def test_asof_join(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 09:00:00")],
        "k long, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 10.0), (1, "2024-01-01 11:00:00", 20.0),
         (2, "2024-01-01 09:30:00", 99.0)],
        "k long, rt string, v double",
    ).withColumn("rt", F.col("rt").cast("timestamp"))
    out = joins.asof_join(left, right, key="k", left_time="t", right_time="rt",
                          right_values=["v"])
    got = {(r.k, r.t.hour): r.v_asof for r in out.collect()}
    assert got == {(1, 10): 10.0, (1, 12): 20.0, (2, 9): None}


def test_read_csv_multi_sentinel(spark, tmp_path):
    # S1/T13: N/A inside a numeric column must null out at read time (so dtype
    # inference still yields double), and the remaining sentinels (NA, null)
    # null out post-read on string columns. Empty cells are null by default.
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,salary,note\n"
        "1,100.5,ok\n"
        "2,N/A,NA\n"
        "3,,null\n"
        "4,250.0,fine\n"
    )
    from agent_data_wrangler_spark.sources.readers import read_csv

    df = read_csv(spark, str(p))
    types = dict(df.dtypes)
    assert types["salary"] == "double"
    rows = {r.id: (r.salary, r.note) for r in df.collect()}
    assert rows[2] == (None, None)
    assert rows[3] == (None, None)
    assert rows[1] == (100.5, "ok")


def test_canonicalize_fuzzy_preserves_duplicates(spark):
    # Regression: identical input rows must NOT collapse (the window now
    # partitions on a synthetic row id, not on every column).
    df = spark.createDataFrame(
        [("enginr",), ("enginr",), ("Desginer",)], "job string"
    )
    out = transform.canonicalize_fuzzy(df, "job", ["Engineer", "Designer"], max_distance=2)
    vals = sorted(r.job for r in out.collect())
    assert vals == ["Designer", "Engineer", "Engineer"]


def test_head_preview(spark):
    # P3
    from agent_data_wrangler_spark.operators import profile

    df = spark.range(100).toDF("x")
    assert profile.head(df, 7).count() == 7


def test_table_profile_cache(spark):
    # P7: one-shot profile struct reused across stages without re-profiling
    from agent_data_wrangler_spark.operators.profile import TableProfile

    df = spark.createDataFrame([(1, None), (2, "b"), (3, None)], "id int, s string")
    p = TableProfile.of(df)
    assert (p.n_rows, p.n_cols) == (3, 2)
    assert p.columns == ["id", "s"]
    assert p.null_counts == {"id": 0, "s": 2}


def test_rename_and_derive(spark):
    # T12
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 2.0)], "a int, b double")
    out = transform.rename_columns(df, {"a": "key", "b": "val"})
    assert out.columns == ["key", "val"]
    derived = out.withColumn("val2", F.col("val") * 2)
    assert derived.collect()[0].val2 == 4.0


def test_latest_version_rescan(spark, tmp_path):
    # S3: each stage reads the newest *_clean version
    from agent_data_wrangler_spark.sources.writers import latest_version_path, write_versioned

    base = str(tmp_path / "data.csv")
    df1 = spark.createDataFrame([(1,)], "x int")
    df2 = spark.createDataFrame([(1,), (2,)], "x int")
    assert latest_version_path(base) == base  # nothing written yet
    p1 = write_versioned(df1, base, fmt="csv", single_file=True)
    assert latest_version_path(base) == p1
    p2 = write_versioned(df2, base, fmt="csv", single_file=True)
    assert latest_version_path(base) == p2
    back = spark.read.option("header", True).csv(latest_version_path(base))
    assert back.count() == 2


def test_collections_functions(spark):
    # §2.6 array/map/json scalar fns
    from pyspark.sql import functions as F

    from agent_data_wrangler_spark.functions.collections import (
        array_l2_normalize,
        json_get,
        json_get_typed,
        json_to_map,
        map_get,
        sorted_keys,
    )

    df = spark.createDataFrame(
        [('{"k": 3, "name": "x"}',), ("not json",), (None,)], "props string"
    )
    out = df.select(
        json_get("props", "$.name").alias("name"),
        json_get_typed("props", "$.k", "bigint").alias("k"),
        sorted_keys(json_to_map("props")).alias("keys"),
        map_get(json_to_map("props"), "k").alias("k_str"),
    ).collect()
    assert (out[0].name, out[0].k, out[0].keys, out[0].k_str) == ("x", 3, ["k", "name"], "3")
    assert out[1].k is None and out[2].k is None

    v = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
    norm = v.select(array_l2_normalize("v").alias("n")).collect()[0].n
    assert norm == [0.6, 0.8]


def test_require_exists_guard(spark):
    # S6: pre-flight existence check raises before any job runs
    import pytest as _pytest

    from agent_data_wrangler_spark.sources.readers import read_parquet, require_exists

    with _pytest.raises(FileNotFoundError):
        require_exists("/root/testdata/sf0.001/nope.parquet")
    with _pytest.raises(FileNotFoundError):
        read_parquet(spark, "/root/testdata/sf0.001/nope.parquet")


def test_describe_auto_size_switch(spark, tmp_path):
    # Small parquet-backed frame under the threshold -> exact path
    # (bit-identical to describe_numeric exact); threshold 0 -> approx sketch
    # path. The switch reads plan stats only (no job) — parquet scans carry
    # real file-size stats; statless plans (e.g. local relations, which
    # report Long.MaxValue) deliberately fall to the approx/safe side.
    src = str(tmp_path / "nums.parquet")
    spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double").write.parquet(src)
    df = spark.read.parquet(src)
    exact = profile.describe_numeric(df, ["x"]).collect()
    auto = profile.describe_auto(df, ["x"]).collect()
    assert auto == exact
    approx = profile.describe_auto(df, ["x"], exact_max_bytes=0).collect()[0]
    # sketch quantiles pick real elements; moments are exact either way
    assert approx["count"] == 100 and approx["mean"] == exact[0]["mean"]
    assert approx["p50"] in {49.0, 50.0, 51.0}


def test_sessionize_gap_semantics(spark):
    # One user, events at t=0s, 10s, 2000s, 2010s, 5000s with a 30-min... no:
    # gap=60s -> sessions {0,10}, {2000,2010}, {5000}; second user is
    # independent (session ids restart per key).
    from agent_data_wrangler_spark.operators.windows import sessionize

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (1, 2, "2024-01-01 00:00:10"),
        (1, 3, "2024-01-01 00:33:20"),
        (1, 4, "2024-01-01 00:33:30"),
        (1, 5, "2024-01-01 01:23:20"),
        (2, 6, "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(rows, "uid int, eid int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, ["uid"], "ts", gap_seconds=60, tiebreak=["eid"])
    got = {(r["uid"], r["eid"]): r["session_id"] for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 2, (1, 5): 3, (2, 6): 1}


def test_sessionize_boundary_exact_gap_continues(spark):
    # gap EXACTLY equal to the threshold stays in-session (strict > splits).
    from agent_data_wrangler_spark.operators.windows import sessionize

    rows = [(1, 1, "2024-01-01 00:00:00"), (1, 2, "2024-01-01 00:01:00")]
    df = spark.createDataFrame(rows, "uid int, eid int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, ["uid"], "ts", gap_seconds=60, tiebreak=["eid"])
    assert {r["session_id"] for r in out.collect()} == {1}


def test_mad_filter_robust_where_sigma_filter_is_masked(spark):
    # Classic masking: with n points, a single outlier's z-score is bounded
    # by (n-1)/sqrt(n), so at n=10 NO value — however extreme — can exceed
    # 3σ (9/√10 ≈ 2.85). The mean±kσ rule keeps the 1e9 row; median/MAD
    # bounds are untouched by it and drop it.
    vals = [(float(i),) for i in range(1, 10)] + [(1e9,)]
    df = spark.createDataFrame(vals, "x double")
    sigma_kept = filters.sigma_outlier_filter(df, ["x"], k=3.0).count()
    mad_kept = filters.mad_outlier_filter(df, "x", k=3.0).count()
    assert sigma_kept == 10  # outlier masked its own detection
    assert mad_kept == 9     # robust fit rejects it


def test_mad_filter_keeps_nulls(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (None,), (1e9,)], "x double")
    out = filters.mad_outlier_filter(df, "x", k=3.0)
    assert out.count() == 4  # 3 inliers + the null row


def test_validate_rules_counts(spark):
    from agent_data_wrangler_spark.operators import validate

    rows = [
        (1, "a", 5.0), (2, "a", 50.0), (2, "b", None), (4, "zz", -1.0),
    ]
    df = spark.createDataFrame(rows, "id int, cat string, v double")
    out = validate.check_rules(df, [
        ("v_not_null", validate.not_null("v")),
        ("v_in_range", validate.in_range("v", 0, 10)),
        ("cat_ok", validate.accepted_values("cat", ["a", "b"])),
        ("cat_shape", validate.matches("cat", "^[ab]$")),
        ("id_unique", validate.unique("id")),
    ])
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {
        "v_not_null": 1, "v_in_range": 2, "cat_ok": 1, "cat_shape": 1,
        "id_unique": 1,
    }
    # the whole suite must compile to ONE aggregate job feeding stack() —
    # never a job per rule. (count_distinct makes Catalyst rewrite through
    # an Expand, which prints a second scan string in the AQE plan; the
    # bound is 2 scans for a 5-rule suite, not 5.)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "stack(5" in plan
    assert plan.count("Scan ExistingRDD") <= 2


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [(1,)] * 8 + [(2,)] * 1 + [(3,)] * 1, "k int"
    )
    row = profile.key_skew(df, "k").first()
    assert (row["n_keys"], row["n_rows"], row["max_key_rows"]) == (3, 10, 8)
    assert row["skew_factor"] == 2.4  # 8 / (10/3)


def test_jsonl_roundtrip_and_merged_schema(spark, tmp_path):
    from agent_data_wrangler_spark.sources.readers import (
        read_jsonl,
        read_parquet_merged,
    )

    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", None)], "id bigint, s string, v double"
    )
    p = str(tmp_path / "d.json")
    df.write.json(p)
    back = read_jsonl(spark, p, schema=df.schema)
    assert sorted((r["id"], r["s"], r["v"]) for r in back.collect()) == [
        (1, "x", 1.5), (2, "y", None),
    ]

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1,)], "id bigint").write.parquet(v1)
    spark.createDataFrame([(2, "new")], "id bigint, extra string").write.parquet(v2)
    merged = read_parquet_merged(spark, v1, v2)
    got = {r["id"]: r["extra"] for r in merged.collect()}
    assert got == {1: None, 2: "new"}


def test_fuzzy_join_best_match_ties_and_unmatched(spark):
    left = spark.createDataFrame(
        [("applw",), ("banana",), ("qqqqqq",)], "name string"
    )
    right = spark.createDataFrame(
        [("apple",), ("apply",), ("banana",)], "canon string"
    )
    out = joins.fuzzy_join(left, right, "name", "canon", max_dist=2)
    got = {r["name"]: (r["canon"], r["__dist"]) for r in out.collect()}
    # 'applw' is distance 1 from BOTH apple and apply -> tie broken asc
    assert got["applw"] == ("apple", 1)
    assert got["banana"] == ("banana", 0)
    assert got["qqqqqq"] == (None, None)  # unmatched kept with NULLs
    assert len(got) == 3  # exactly one row per left row


def test_with_ntile_deterministic_buckets(spark):
    from agent_data_wrangler_spark.operators.windows import with_ntile

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 9)], "grp string, id int, v double"
    )
    out = with_ntile(df, 4, ["grp"], [F.asc("v"), F.asc("id")], alias="q")
    got = {r["id"]: r["q"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}


def test_validate_rules_empty_table_reports_zero(spark):
    from agent_data_wrangler_spark.operators import validate

    df = spark.createDataFrame([], "id int, v double")
    out = validate.check_rules(df, [
        ("v_not_null", validate.not_null("v")),
        ("v_in_range", validate.in_range("v", 0, 1)),
        ("id_unique", validate.unique("id")),
    ])
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {"v_not_null": 0, "v_in_range": 0, "id_unique": 0}


def test_stratified_sample_deterministic_and_stratum_gated(spark):
    from agent_data_wrangler_spark.operators.aggregates import stratified_sample

    rows = [(i, "common" if i % 10 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, cls string")
    frac = {"rare": 1.0, "common": 0.1}
    a = sorted(r["id"] for r in stratified_sample(df, "cls", frac, seed=7).collect())
    b = sorted(r["id"] for r in stratified_sample(df, "cls", frac, seed=7).collect())
    assert a == b  # same seed -> identical draw
    got = stratified_sample(df, "cls", frac, seed=7)
    per = {r["cls"]: r["n"] for r in got.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["rare"] == 100          # fraction 1.0 keeps every rare row
    assert 40 <= per.get("common", 0) <= 180  # ~90 expected, loose bound
    # strata absent from fractions are dropped entirely
    dropped = stratified_sample(df, "cls", {"rare": 1.0}, seed=7)
    assert {r["cls"] for r in dropped.select("cls").distinct().collect()} == {"rare"}


def test_write_range_sorted_files_have_disjoint_ranges(spark, tmp_path):
    import glob

    from agent_data_wrangler_spark.sources.writers import write_range_sorted

    df = spark.range(0, 10_000).toDF("x").withColumn(
        "x", (F.col("x") * 2654435761 % 10_000).cast("bigint")  # shuffled values
    )
    out = str(tmp_path / "ranged")
    write_range_sorted(df, out, "x", num_files=4)
    ranges = []
    for f in glob.glob(out + "/part-*.parquet"):
        pdf = spark.read.parquet(f).agg(F.min("x"), F.max("x")).first()
        ranges.append((pdf[0], pdf[1]))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: file-level min/max stats are selective


def test_distributed_prefix_sum_matches_plain_window(spark):
    """Two-phase prefix sum must equal sum() OVER (PARTITION BY g ORDER BY o)
    exactly — including exclusive/inclusive frames, multiple buckets (n_buckets
    smaller than the id range forces real bucket offsets), and the empty frame."""
    from pyspark.sql import Window

    from agent_data_wrangler_spark.operators.windows import distributed_prefix_sum

    rows = [(f"g{i % 3}", i, (i * 7) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = distributed_prefix_sum(df, "v", "o", ["g"], n_buckets=8).select(
        "g", "o", "cum_before"
    )
    w = (
        Window.partitionBy("g").orderBy(F.asc("o"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "g", "o", (F.sum("v").over(w) - F.col("v")).cast("bigint").alias("cum_before")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    inc = distributed_prefix_sum(df, "v", "o", ["g"], n_buckets=8, inclusive=True)
    want_inc = df.select(
        "g", "o", F.sum("v").over(w).cast("bigint").alias("cum_before")
    )
    assert inc.select("g", "o", "cum_before").exceptAll(want_inc).count() == 0

    empty = distributed_prefix_sum(df.limit(0), "v", "o", ["g"])
    assert empty.count() == 0 and "cum_before" in empty.columns


def test_hash_split_deterministic_and_proportional(spark):
    """Same salt → identical assignment across calls/partitionings; different
    salt → a re-draw; observed fractions concentrate near the targets."""
    from agent_data_wrangler_spark.operators.splits import hash_split

    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    a = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    b = hash_split(df.repartition(7), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - 3200) < 200   # ~6 sd of binomial(4000, .8)
    assert abs(counts["val"] - 400) < 150

    c = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2")
    moved = a.join(c.withColumnRenamed("split", "split2"), "k").filter(
        F.col("split") != F.col("split2")
    ).count()
    assert moved > 0  # new salt = new epoch


def test_hash_split_boundaries_validate():
    from agent_data_wrangler_spark.operators.splits import split_boundaries

    with pytest.raises(ValueError):
        split_boundaries({"a": -0.1, "b": 1.1})
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.0})
    bounds = split_boundaries({"a": 1, "b": 3})  # unnormalized fractions OK
    assert bounds[0][1] == format(int(0.25 * 16**8), "08x")


def test_redact_pii_cases(spark):
    from agent_data_wrangler_spark.functions.strings import pii_count, redact_pii

    rows = [
        ("mail me at jo.doe+x@sub.example.org today", "[EMAIL]", "email", 1),
        ("call +1 (555) 123-4567 now", "[PHONE]", "phone", 1),
        ("server 192.168.1.254 is down", "[IP]", "ip", 1),
        ("no pii here at all", None, "email", 0),
        ("version 1.2 of 3.4 is fine", None, "ip", 0),  # short dotted runs stay
    ]
    df = spark.createDataFrame(
        [(t, exp, kind, n) for t, exp, kind, n in rows],
        "text string, expect string, kind string, n int",
    )
    got = df.select(
        "text", "expect", "kind", "n",
        redact_pii("text").alias("clean"),
        *[pii_count("text", k).alias(f"c_{k}") for k in ("email", "phone", "ip")],
    ).collect()
    for r in got:
        if r["expect"]:
            assert r["expect"] in r["clean"], r
        else:
            assert r["clean"] == r["text"], r
        assert r[f"c_{r['kind']}"] == r["n"], r


def test_winnow_fingerprints_overlap_guarantee(spark):
    """Two docs sharing a run of >= w+k-1 tokens MUST share a fingerprint;
    short docs fall back to the global-min rule; sub-k docs yield none."""
    from agent_data_wrangler_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = w+k-1
    rows = [
        (1, "intro words " + shared + " trailing bits here"),
        (2, shared + " completely different ending tokens now"),
        (3, "tiny doc"),                       # < k tokens → no fingerprints
        (4, "one two three four five six"),    # k..w+k-2 tokens → global min
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: set(r["fps"]) for r in df.select(
        "id", winnow_fingerprints("text", k=5, w=4).alias("fps")
    ).collect()}
    assert out[1] & out[2], "overlapping docs must share a fingerprint"
    assert out[3] == set()
    assert len(out[4]) == 1


def test_distributed_prefix_sum_null_keys_and_order(spark):
    """NULL partition keys form their own group (null-safe join keeps them)
    and NULL order values sort first — matching the plain window's
    NULLS FIRST, instead of silently dropping rows."""
    from pyspark.sql import Window

    from agent_data_wrangler_spark.operators.windows import distributed_prefix_sum

    rows = [("a", 1, 10), ("a", 2, 20), (None, 1, 5), (None, 2, 7), ("b", None, 3), ("b", 4, 9)]
    df = spark.createDataFrame(rows, "g string, o int, v long")
    got = distributed_prefix_sum(df, "v", "o", ["g"], n_buckets=4)
    assert got.count() == len(rows)  # nothing dropped
    vals = {(r["g"], r["o"]): r["cum_before"] for r in got.collect()}
    assert vals[(None, 1)] == 0 and vals[(None, 2)] == 5
    assert vals[("b", None)] == 0 and vals[("b", 4)] == 3  # null order first
    w = (
        Window.partitionBy("g").orderBy(F.asc_nulls_first("o"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select("g", "o", (F.sum("v").over(w) - F.col("v")).cast("bigint").alias("cum_before"))
    assert got.select("g", "o", "cum_before").exceptAll(want).count() == 0


def test_default_registry_includes_splits(spark):
    from agent_data_wrangler_spark.plans.pipeline import Pipeline, default_registry

    assert "hash_split" in default_registry()
    pipe = Pipeline.from_spec("split", [
        {"op": "hash_split", "params": {"id_col": "k", "fractions": {"a": 0.5, "b": 0.5}}}
    ])
    out = pipe.run(spark.range(100).withColumnRenamed("id", "k")).df
    assert set(out.columns) == {"k", "split"}


def test_bpe_ish_token_count_cases(spark):
    from agent_data_wrangler_spark.functions.text import bpe_ish_token_count

    rows = [
        ("hello world", 2),          # plain words
        ("don't stop!", 4),          # don + t + stop, ' and ! count as pieces -> 3 words + 2 punct
        ("a,b,,c", 5),               # 3 words + 2 commas
        ("", 0),
        ("  ", 0),
    ]
    # recompute expected per the documented rule: word-ish runs + punct marks
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(bpe_ish_token_count("text")).collect()]
    import re
    for (t, _), g in zip(rows, got):
        words = len([w for w in re.split(r"[^A-Za-z0-9]+", t) if w])
        punct = len(re.findall(r"[^\w\s]", t))
        assert g == words + punct, (t, g, words, punct)


def test_fill_mode_and_global_stats_direct(spark):
    """The T3/A1 convenience surfaces: fill_mode fills every listed column
    with its deterministic mode (ties by ascending value); global_stats is
    the one-pass single-column describe."""
    from agent_data_wrangler_spark.operators.aggregates import global_stats
    from agent_data_wrangler_spark.operators.impute import fill_mode

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 3.0), (None, 3.0), ("b", None), ("a", 2.0)],
        "s string, v double",
    )
    filled = fill_mode(df, ["s", "v"])
    assert filled.filter(F.col("s").isNull() | F.col("v").isNull()).count() == 0
    assert filled.filter(F.col("s") == "a").count() == 4       # mode of s
    assert filled.filter(F.col("v") == 3.0).count() == 4       # mode of v

    row = global_stats(df, "v").first()
    assert row["n"] == 4 and row["min"] == 1.0 and row["max"] == 3.0
    assert row["median"] == 2.5 and abs(row["mean"] - 2.25) < 1e-9


def test_compact_many_tiny_files(spark, tmp_path):
    """Small-file compaction: 64 tiny parquet files rewrite into
    ~total_bytes/target files, values intact; in_place swaps the directory."""
    import glob
    import os

    from agent_data_wrangler_spark.sources.writers import compact

    src = str(tmp_path / "tiny")
    df = spark.range(20_000).withColumn("payload", F.md5(F.col("id").cast("string")))
    df.repartition(64).write.parquet(src)
    data_files = glob.glob(src + "/part-*.parquet")
    assert len(data_files) == 64
    total = sum(os.path.getsize(f) for f in data_files)

    target_mb = 1  # force a deterministic small file budget
    out = compact(spark, src, target_mb=target_mb)
    got_files = glob.glob(out + "/part-*.parquet")
    import math
    assert len(got_files) == max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    assert len(got_files) < 64
    # round-trip: same rows, and the original is untouched (S2 convention)
    assert spark.read.parquet(out).orderBy("id").collect() == df.orderBy("id").collect()
    assert len(glob.glob(src + "/part-*.parquet")) == 64

    # in-place mode swaps the directory itself
    out2 = compact(spark, src, target_mb=1024, in_place=True)
    assert out2 == src
    assert len(glob.glob(src + "/part-*.parquet")) == 1
    assert spark.read.parquet(src).count() == 20_000


def test_describe_bracketed_bit_identical(spark):
    """The r14 two-pass bracketed exact quartiles must be BIT-identical to
    the single-pass F.percentile plan on every distribution shape that
    stresses the bracket math: high-cardinality, constant (lo==hi bracket),
    bimodal massive boundary ties, tiny n (interpolation between two
    values), +/-0.0 mixtures, nulls, and an all-null column."""
    import random

    from agent_data_wrangler_spark.operators.profile import (
        _describe_numeric_onepass,
        _exact_quartiles_bracketed,
        describe_numeric,
    )

    rng = random.Random(7)
    n = 999
    rows = []
    for i in range(n):
        rows.append((
            rng.uniform(-1e6, 1e6),                      # high-cardinality
            7.25,                                        # constant
            0.0 if i % 2 == 0 else 1.0,                  # bimodal ties
            float(i % 4),                                # few distinct
            rng.choice([-0.0, 0.0, 1.5, -2.5]),          # signed zeros
            rng.uniform(0, 1) if i % 3 == 0 else None,   # nulls
            None,                                        # all null
        ))
    cols = list("abcdefg")
    df = spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in cols))
    # the bracketed path must actually engage here (None would mean every
    # shape above silently fell back and the comparison proves nothing)
    assert _exact_quartiles_bracketed(df, cols) is not None
    # and NaN data must NOT take it
    assert _exact_quartiles_bracketed(
        spark.createDataFrame([(float("nan"),), (1.0,)], "x double"), ["x"]
    ) is None
    fast = describe_numeric(df, cols, bracket_min_bytes=0).collect()
    slow = _describe_numeric_onepass(df, cols, approx=False).collect()
    assert len(fast) == len(slow) == len(cols)
    for fr, sr in zip(fast, slow):
        for k in ("column", "count", "mean", "std", "min",
                  "p25", "p50", "p75", "max"):
            assert fr[k] == sr[k], (fr["column"], k, fr[k], sr[k])
    # tiny frames exercise exact-rank interpolation between two values
    tiny = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    f2 = describe_numeric(tiny, ["x"], bracket_min_bytes=0).collect()[0]
    s2 = _describe_numeric_onepass(tiny, ["x"], approx=False).collect()[0]
    assert (f2["p25"], f2["p50"], f2["p75"]) == (s2["p25"], s2["p50"], s2["p75"])
    # NaN data must take the fallback path and still agree
    nan_df = spark.createDataFrame(
        [(float("nan"),), (1.0,), (2.0,), (3.0,)], "x double")
    fn = describe_numeric(nan_df, ["x"], bracket_min_bytes=0).collect()[0]
    sn = _describe_numeric_onepass(nan_df, ["x"], approx=False).collect()[0]
    import struct as _s

    def bits(v):  # NaN == NaN for this comparison; bit-level equality
        return _s.pack(">d", v) if isinstance(v, float) else v

    assert tuple(bits(fn[k]) for k in ("p25", "p50", "p75")) == tuple(
        bits(sn[k]) for k in ("p25", "p50", "p75"))
