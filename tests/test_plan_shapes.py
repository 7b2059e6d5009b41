"""Physical-plan regression tests: the 100 TB properties the queries claim
(pushdown, broadcast, TakeOrderedAndProject, shuffle counts) asserted against
the actual executed plans — a perf claim that isn't in the plan is a comment,
not a property."""

from __future__ import annotations

import pytest

from agent_data_wrangler_spark.operators import similarity as similarity_ops
from agent_data_wrangler_spark.queryset import QUERIES as Q1
from agent_data_wrangler_spark.queryset_nstar import QUERIES as Q2


def _plan(spark, name, sf_dir) -> str:
    q = {**Q1, **Q2}[name]
    return q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def _final_plan(spark, name, sf_dir) -> str:
    """Execute, then read the finalized adaptive plan (codegen annotations
    only appear once AQE has finalized stages)."""
    q = {**Q1, **Q2}[name]
    df = q(spark, sf_dir)
    df.collect()  # a write would spawn its own execution; collect finalizes THIS one
    return df._jdf.queryExecution().executedPlan().toString()


def test_a1_filter_pushes_to_scan(spark, sf_dir):
    plan = _plan(spark, "a1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # '*(n)' markers = whole-stage-codegen stages in the finalized AQE plan
    assert "*(1)" in _final_plan(spark, "a1_pricing_summary", sf_dir)


def test_a1_column_pruning(spark, sf_dir):
    plan = _plan(spark, "a1_pricing_summary", sf_dir)
    # ReadSchema must NOT include unused wide columns (e.g. l_comment-ish);
    # lineitem has 11 columns, the query needs 7.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_j1_broadcasts_customer_dim(spark, sf_dir):
    plan = _plan(spark, "j1_revenue_by_segment", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_k1_no_global_sort(spark, sf_dir):
    plan = _plan(spark, "k1_top10_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort stage


def test_n3_topk_cosine_zero_shuffle(spark, sf_dir):
    plan = _plan(spark, "n3_topk_cosine_embeddings", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # the claimed zero-shuffle property


def test_n1_dedup_shuffles_fingerprints_not_text(spark, sf_dir):
    plan = _plan(spark, "n1_exact_dedup_documents", sf_dir)
    # the pre-shuffle hash partitioning must key on the md5 fingerprint, and
    # the exchanged attributes must not carry the raw text column
    exchange_lines = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchange_lines, plan
    assert all("text" not in l for l in exchange_lines)


def test_sm1_sample_no_shuffle(spark, sf_dir):
    """The sample leg itself stays a map-side filter: a Sample operator with
    no hash shuffle anywhere (the verdict aggregates are single-partition
    count rollups, which AQE may exchange to 1 partition but never by key)."""
    plan = _plan(spark, "sm1_seeded_sample_orders", sf_dir)
    assert "Exchange hashpartitioning" not in plan
    assert "Sample" in plan


@pytest.mark.parametrize("name", ["w2_cumulative_spend", "w4_rolling_avg_spend"])
def test_windows_shuffle_once(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1


def test_no_cartesian_product_anywhere(spark, sf_dir):
    """Sweep every registered query plan: a CartesianProduct node means a
    join lost its keys — the canonical accidental O(n^2). Intentional 1-row
    crossJoins compile to BroadcastNestedLoopJoin over single-row sides and
    are fine. Streaming queries are skipped (building them runs the stream)."""
    skip = {"st1_streaming_window_counts", "st2_streaming_sessions",
            "st3_streaming_dedup_count", "st4_streaming_enriched_segments",
            "st5_incremental_rollup_events", "st6_stateful_user_totals"}
    bad = []
    for name, q in {**Q1, **Q2}.items():
        if name in skip:
            continue
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append(name)
    assert not bad, f"cartesian products in: {bad}"


def test_sn1_windows_share_one_exchange(spark, sf_dir):
    """lag + running-sum + groupBy(user_id, session_id) must all reuse the
    user_id hash partitioning: exactly 2 exchanges total — the window shuffle
    and the final session-size-distribution aggregate."""
    plan = _plan(spark, "sn1_sessionize_events", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 2


def test_bk1_bucketed_join_zero_exchange(spark, sf_dir):
    """With broadcast disabled, the bucketed orders⋈customer join must read
    bucket files as pre-shuffled partitions: a SortMergeJoin whose only
    Exchange is the final groupBy(segment) aggregate."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "bk1_bucketed_join_revenue", sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pp1_partition_pruning(spark, sf_dir):
    """The event_type predicate must resolve at the directory level
    (PartitionFilters) with nothing left for the row-level parquet filter."""
    plan = _plan(spark, "pp1_partition_pruned_events", sf_dir)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "= purchase)" in plan
    assert "PushedFilters: []" in plan


def test_j8_star_join_plan(spark, sf_dir):
    """Q3 shape: customer leg broadcast, filters pushed into the scans,
    top-10 via TakeOrderedAndProject (no global sort stage)."""
    plan = _plan(spark, "j8_shipping_priority", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_ch1_single_exchange(spark, sf_dir):
    """Chunking is per-row Column folds: the ONLY shuffle is the final tiny
    groupBy on lang — no Python, no explode-join."""
    plan = _plan(spark, "ch1_chunk_documents", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan  # pure Column expressions, no UDF boundary


def test_pk1_no_single_reducer_per_source_window(spark, sf_dir):
    """Packing's prefix sum must be the two-phase form: the doc-level ordered
    window is partitioned by (source, bucket) — NEVER by source alone, which
    funnels each source's whole corpus through one reducer. The only window
    allowed to partition by bare source is the offsets cumsum over the tiny
    per-bucket partials (it orders by the bucket column)."""
    plan = _plan(spark, "pk1_pack_documents", sf_dir)
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    assert win_lines, "expected window operators in the pk1 plan"
    doc_level = [ln for ln in win_lines if "doc_id" in ln]
    assert doc_level, "expected a doc-ordered window"
    for ln in doc_level:
        assert "__psb" in ln.split("windowspecdefinition")[1].split("ASC")[0], (
            "doc-level window must be partitioned by (source, bucket): " + ln
        )
    assert "BroadcastHashJoin" in plan  # offsets re-join is broadcast, not shuffled


def test_dc1_benchmark_side_broadcast(spark, sf_dir):
    """Decontamination must semi-join corpus shingles against a BROADCAST
    benchmark set — a shuffled join here would move the whole exploded
    corpus for a KB-sized right side."""
    plan = _plan(spark, "dc1_decontaminate_documents", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


@pytest.mark.parametrize("name", [
    "sp1_hash_split_documents",
    "gq1_repetition_quality_documents",
    "pi1_redact_pii_documents",
])
def test_round4_text_ops_stay_in_codegen(spark, sf_dir, name):
    """Split assignment, repetition stats, and PII redaction are scan-stage
    Column expressions: no Python boundary anywhere, exactly one hash
    exchange (the rollup), and no global sort (pi1's checksum is a
    commutative sum, not an ordered concat)."""
    plan = _plan(spark, name, sf_dir)
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Sort " not in plan


def test_rh1_shuffles_fingerprints_not_text(spark, sf_dir):
    """Winnowing explodes 8-char fingerprints off the scan; document text
    must never enter an exchange."""
    plan = _plan(spark, "rh1_winnow_fingerprints_documents", sf_dir)
    assert "Python" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_n10_lsh_layout_partition_pruned(spark, sf_dir):
    """The bucketed ANN serving layout must prune at the PARTITION level:
    the probe set appears as a __bpart IN (...) PartitionFilter (no full
    directory scan) and the exact bucket filter is pushed to parquet row
    groups."""
    plan = _plan(spark, "n10_lsh_pruned_topk_embeddings", sf_dir)
    layout_scans = [ln for ln in plan.splitlines()
                    if "FileScan" in ln and "embeddings_lsh" in ln]
    assert layout_scans, plan
    for ln in layout_scans:
        part = ln.split("PartitionFilters:", 1)[1].split("]", 1)[0]
        assert "__bpart" in part, ln
        assert "__bucket" in ln.split("DataFilters:", 1)[1].split("]", 1)[0], ln


def test_n10_layout_probes_subset_of_partitions(spark, sf_dir, tmp_path):
    """write_lsh_bucketed + topk_cosine_lsh_pruned round-trip on a fresh
    layout: the pruned read returns the same top-k as the inline LSH probe
    over the same planes (identical probe semantics, different physics)."""
    from agent_data_wrangler_spark.queryset_nstar import QUERY_VEC
    from agent_data_wrangler_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "lsh_layout")
    num_planes, shift = similarity_ops.write_lsh_bucketed(
        e, "embedding", path, partition_bits=2
    )
    assert shift == max(0, num_planes - 2)
    pruned = similarity_ops.topk_cosine_lsh_pruned(
        spark, path, "embedding", QUERY_VEC, k=10,
        num_planes=num_planes, shift=shift, payload_cols=["vec_id"],
    ).collect()
    inline = similarity_ops.topk_cosine_lsh(
        e, "embedding", QUERY_VEC, k=10,
        num_planes=num_planes, multiprobe=2, payload_cols=["vec_id"],
    ).collect()
    assert [r.vec_id for r in pruned] == [r.vec_id for r in inline]


def test_n11_ivf_layout_partition_pruned(spark, sf_dir):
    """The IVF serving layout must read only the probed inverted lists:
    __list IN (...) resolves as a PartitionFilter on the layout scan."""
    plan = _plan(spark, "n11_ivf_pruned_topk_embeddings", sf_dir)
    layout_scans = [ln for ln in plan.splitlines()
                    if "FileScan" in ln and "embeddings_ivf" in ln]
    assert layout_scans, plan
    for ln in layout_scans:
        part = ln.split("PartitionFilters:", 1)[1].split("]", 1)[0]
        assert "__list" in part, ln


def test_ivf_pruned_layout_self_describing(spark, sf_dir, tmp_path):
    """write_ivf_partitioned + topk_cosine_ivf_pruned round-trip using ONLY
    the path (centroids come from the sidecar metadata), matching the inline
    IVF result over the same fit."""
    from agent_data_wrangler_spark.queryset_nstar import QUERY_VEC
    from agent_data_wrangler_spark.sources.readers import read_table

    e = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_layout")
    centroids = similarity_ops.write_ivf_partitioned(e, "embedding", path)
    meta = similarity_ops.read_index_meta(path)
    assert meta["kind"] == "ivf" and meta["centroids"] == centroids
    pruned = similarity_ops.topk_cosine_ivf_pruned(
        spark, path, "embedding", QUERY_VEC, k=10, payload_cols=["vec_id"]
    ).collect()
    inline = similarity_ops.topk_cosine_ivf(
        e, "embedding", QUERY_VEC, k=10, payload_cols=["vec_id"]
    ).collect()
    assert [r.vec_id for r in pruned] == [r.vec_id for r in inline]


def test_cd1_merge_base_never_shuffled(spark, sf_dir):
    """CDC MERGE (cd1): the base snapshot side must reach the anti-join by
    broadcast of the changed-key set — never by shuffling the base. The
    changeset window gets rank-limit pushdown (WindowGroupLimit) so only
    the per-key winner crosses its exchange."""
    plan = _plan(spark, "cd1_apply_changes_orders", sf_dir)
    assert "LeftAnti" in plan and "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan  # top-1-per-key pushed below the shuffle
    # Only the changeset (tiny) may hash-shuffle — once per window instance.
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_ts2_gap_fill_single_exchange(spark, sf_dir):
    """Forward fill is ONE shuffle on user_id; the null-planting CASE stays
    in the scan stage's projection."""
    plan = _plan(spark, "ts2_gap_fill_events", sf_dir)
    assert plan.count("Exchange") == 1, plan


def test_sub1_decorrelated_no_cartesian(spark, sf_dir):
    """The hand-decorrelated Q17 shape: per-part limit aggregate + two hash
    joins on the part key; no nested-loop anywhere."""
    plan = _plan(spark, "sub1_small_quantity_revenue", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_an1_rolling_anomaly_single_exchange(spark, sf_dir):
    """Rolling anomaly: all three frame aggregates (count/sum/sum-sq) share
    ONE window spec — one shuffle on user_id, no extra sorts."""
    plan = _plan(spark, "an1_rolling_anomaly_events", sf_dir)
    assert plan.count("Exchange") == 1, plan


def test_ri1_single_child_scan(spark, sf_dir):
    """All three lineitem FK edges must check in ONE lineitem scan (chained
    broadcast left joins + one aggregate), not one scan per edge."""
    plan = _plan(spark, "ri1_referential_integrity", sf_dir)
    lineitem_scans = plan.count("lineitem.parquet")
    assert lineitem_scans == 1, f"{lineitem_scans} lineitem scans\n{plan}"
    assert "BroadcastHashJoin" in plan


def test_no_row_at_a_time_python_anywhere(spark, sf_dir):
    """Sweep every registered query plan: plain BatchEvalPython means a
    row-at-a-time Python UDF crept into a hot path — the Python boundary
    must always be Arrow-batched (ArrowEvalPython / *InPandas / PythonScan).
    The one sanctioned exception is u4's Python UDTF node
    (BatchEvalPythonUDTF — the UDTF surface itself)."""
    import re

    skip = {"st1_streaming_window_counts", "st2_streaming_sessions",
            "st3_streaming_dedup_count", "st4_streaming_enriched_segments",
            "st5_incremental_rollup_events", "st6_stateful_user_totals",
            "st7_stream_stream_join_events"}
    bad = []
    for name, q in {**Q1, **Q2}.items():
        if name in skip:
            continue
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if re.search(r"BatchEvalPython(?!UDTF)", plan):
            bad.append(name)
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"


def test_tk1_rank_limit_pushdown(spark, sf_dir):
    """Grouped top-k must get WindowGroupLimit: the per-group top-3 is
    computed map-side BEFORE the exchange, so the shuffle carries at most
    k rows per group per task — never the whole table."""
    plan = _plan(spark, "tk1_top3_orders_per_priority", sf_dir)
    assert "WindowGroupLimit" in plan, plan
