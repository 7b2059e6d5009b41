"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation on sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's oracle-checked registry
(agent_data_wrangler_spark/queryset*.py) — one entry per implemented operator
from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from agent_data_wrangler_spark.queryset import QUERIES

    return QUERIES["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


# Most recent round in which each query earned a green (rows+schema+hash)
# driver row, taken from the union of CORRECTNESS_r01..r05.json. Queries
# absent from this map have never been driver-verified and get first claim on
# the capped oracle slots; verified queries rotate least-recently-first so
# every query keeps cycling back through the driver instead of the same ~45
# re-running forever. Refresh each round from the latest CORRECTNESS file.
LAST_GREEN_ROUND: dict[str, int] = {
    # r03
    "n3_topk_cosine_embeddings": 3, "n4_jaccard_pairs_documents": 3,
    "n6_simhash_documents": 3, "pv1_pivot_events": 3, "r1_rollup_orders": 3,
    "s1_setops_active_customers": 3, "s2_setops_priority_rows": 3,
    "st2_streaming_sessions": 3, "st3_streaming_dedup_count": 3,
    "t10_dual_format_dates": 3, "t11_phone_normalize": 3,
    "t13_na_sentinel_events": 3, "t1_median_fill_events": 3,
    "t2_mean_fill_events": 3, "t4_fill_min_date_orders": 3,
    "t5_outlier_null_impute_orders": 3, "t6_cap_p95_orders": 3,
    "t7t8t9_string_clean_nation": 3, "u1_zscore_by_type_events": 3,
    "u2_name_digitsum_customers": 3, "w2_cumulative_spend": 3,
    "w3_event_gaps": 3, "w4_rolling_avg_spend": 3, "x1_crosstab_events": 3,
    # r04
    "ad1_approx_distinct_customers": 4, "bk1_bucketed_join_revenue": 4,
    "bl1_blocked_editdist_documents": 4, "ch1_chunk_documents": 4,
    "csv1_roundtrip_events": 4, "da1_describe_auto_orders": 4,
    "dc1_decontaminate_documents": 4, "dq1_validation_rules_events": 4,
    "fz1_fuzzy_match_nation": 4, "gq1_repetition_quality_documents": 4,
    "j8_shipping_priority": 4, "js1_jsonl_roundtrip_events": 4,
    "md1_mad_outliers_events": 4, "mm1_image_features_documents": 4,
    "mm2_audio_features_documents": 4, "mm3_frame_sample_documents": 4,
    "nt1_quartiles_orders": 4, "p2_shape_lineitem": 4,
    "p5_describe_lineitem": 4, "p5a_describe_approx_lineitem": 4,
    "p6_null_counts_events": 4, "p8_value_counts_priority": 4,
    "p9_duplicate_count_documents": 4, "pi1_redact_pii_documents": 4,
    "pk1_pack_documents": 4, "pl1_pipeline_spec_events": 4,
    "pp1_partition_pruned_events": 4, "rh1_winnow_fingerprints_documents": 4,
    "rj1_time_bands_events": 4, "rp1_report_events": 4,
    "sb1_stratified_sample_events": 4, "se1_schema_evolution_orders": 4,
    "sj1_salted_join_segments": 4, "sk1_key_skew_orders": 4,
    "sm1_seeded_sample_orders": 4, "sn1_sessionize_events": 4,
    "sp1_hash_split_documents": 4, "sq1_portable_sql_revenue": 4,
    "st4_streaming_enriched_segments": 4, "st5_incremental_rollup_events": 4,
    "st6_stateful_user_totals": 4, "tp1_two_phase_agg_orders": 4,
    "ts1_resample_hourly_events": 4, "u3_trimmed_mean_orders": 4,
    "u4_udtf_tokens_documents": 4,
    # r05
    "a1_pricing_summary": 5, "a2_group_stats_events": 5,
    "a4_mode_priority": 5, "a7_corr_lineitem": 5,
    "an1_rolling_anomaly_events": 5, "c1_cube_orders": 5,
    "cc1_components_documents": 5, "cd1_apply_changes_orders": 5,
    "cd2_scd2_orders": 5, "ct1_chi2_events": 5,
    "f1_f2_dropnull_sigma_events": 5, "fn1_funnel_events": 5,
    "g1_grouping_sets_orders": 5, "hg1_histogram_totalprice": 5,
    "im1_incremental_rollup_orders": 5, "j1_revenue_by_segment": 5,
    "j2_customers_without_orders": 5, "j3_customers_with_1997_orders": 5,
    "j4_revenue_by_region": 5, "j5_asof_last_purchase": 5,
    "j6_brand_revenue": 5, "j7_supplier_region_revenue": 5,
    "jn1_json_map_events": 5, "k1_top10_orders": 5,
    "lm1_ngram_coverage_documents": 5, "mf1_dataset_manifest_documents": 5,
    "mx1_mixture_sample_documents": 5, "n10_lsh_pruned_topk_embeddings": 5,
    "n11_ivf_pruned_topk_embeddings": 5,
    "n12_incremental_neardup_documents": 5, "n1_exact_dedup_documents": 5,
    "n2_text_stats_documents": 5, "n5_minhash_neardup_documents": 5,
    "n7_lsh_topk_embeddings": 5, "n8_embedding_neardup_pairs": 5,
    "n9_ivf_topk_embeddings": 5, "or1_orc_roundtrip_events": 5,
    "pd1_python_datasource": 5, "qs1_source_quota_documents": 5,
    "qt1_quantiles_by_type_events": 5, "rc1_retention_events": 5,
    "ri1_referential_integrity": 5, "st1_streaming_window_counts": 5,
    "st7_stream_stream_join_events": 5, "sub1_small_quantity_revenue": 5,
    "sub2_large_volume_customers": 5, "tk1_top3_orders_per_priority": 5,
    "ts2_gap_fill_events": 5, "vr1_variant_events": 5,
    "w1_top_order_per_customer": 5,
}

DRIVER_VERIFIED = frozenset(LAST_GREEN_ROUND)

# Small always-run regression set of established queries, one per major
# tier family (relational, dedup, streaming) — kept ahead of the
# never-verified block so a capped pass still cross-checks prior rounds.
# Shrunk 5 -> 3 in round 6: the round added >45 never-verified queries, so
# every canary slot now starves a new query of its first driver row; the
# join/window canaries (j1/w1) were cut because their families are also
# exercised by a1's scan+agg and the stalest-rotation re-verifies them soon.
CANARIES = ("a1_pricing_summary", "n1_exact_dedup_documents",
            "st1_streaming_window_counts")

# The driver's oracle pass verifies at most this many queries per round.
DRIVER_SLOT_CAP = 50


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (relational tier in
    queryset.py, LLM-data-pipeline tier in queryset_nstar.py).

    Iteration order is deliberate: the driver's oracle pass caps at 50
    queries, so the slots are rationed — a 5-query established canary set
    first, then every oracle query that has never received a driver
    correctness row (the round-3 lesson: ordering established queries first
    guaranteed new work was never driver-verified), then the already-verified
    oracles LEAST-RECENTLY-verified first (the round-4 lesson: once every
    query is verified, a static verified set would re-run the same slate
    forever — rotating by last-green round re-verifies the stalest ~40 each
    round), and rows-only queries (which get the weaker check regardless)
    last.
    """
    from agent_data_wrangler_spark.queryset import ORACLE as O1, QUERIES as Q1
    from agent_data_wrangler_spark.queryset_nstar import ORACLE as O2, QUERIES as Q2

    q = {**Q1, **Q2}
    o = {**O1, **O2}
    canaries = [k for k in CANARIES if k in q]
    unverified = [k for k in q if k in o and k not in LAST_GREEN_ROUND]
    verified = sorted(
        (k for k in q
         if k in o and k in LAST_GREEN_ROUND and k not in CANARIES),
        key=lambda k: (LAST_GREEN_ROUND[k], k))
    rows_only = [k for k in q if k not in o]
    return {k: q[k] for k in canaries + unverified + verified + rows_only}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each registered query — all 119
    as of round 5. The formerly rows-only engine-hash paths (n5/n7/n8/n9)
    carry verdict oracles: the invariant (recall vs exact, subset/containment)
    is computed in Spark and emitted as verdict booleans next to hard values
    DuckDB recomputes from scratch."""
    from agent_data_wrangler_spark.queryset import ORACLE
    from agent_data_wrangler_spark.queryset_nstar import ORACLE as NSTAR

    return {**ORACLE, **NSTAR}
