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


# Every query that already holds a green (rows+schema+hash) row in a prior
# round's CORRECTNESS file (r03: 50/50 green). These have two rounds of
# driver history plus the local DuckDB-parity suite, so under a capped oracle
# pass the scarce driver slots go to queries that have NEVER had a driver row.
# ROUND-5 NOTE: refresh this set from CORRECTNESS_r04.json (add every newly
# green query) so the round-4 additions rotate out of the priority block —
# at 90 oracle queries the 50-slot cap is exactly full (5 canaries + 45
# never-verified) and any further additions will starve without a refresh.
DRIVER_VERIFIED = frozenset({
    "a1_pricing_summary", "p2_shape_lineitem", "p5_describe_lineitem",
    "p6_null_counts_events", "p8_value_counts_priority",
    "p9_duplicate_count_documents", "f1_f2_dropnull_sigma_events",
    "t1_median_fill_events", "t2_mean_fill_events", "a4_mode_priority",
    "t4_fill_min_date_orders", "t5_outlier_null_impute_orders",
    "t6_cap_p95_orders", "t7t8t9_string_clean_nation",
    "t10_dual_format_dates", "t11_phone_normalize", "t13_na_sentinel_events",
    "a2_group_stats_events", "a7_corr_lineitem", "j1_revenue_by_segment",
    "j2_customers_without_orders", "j3_customers_with_1997_orders",
    "j4_revenue_by_region", "w1_top_order_per_customer",
    "w2_cumulative_spend", "w3_event_gaps", "s1_setops_active_customers",
    "pv1_pivot_events", "r1_rollup_orders", "c1_cube_orders",
    "k1_top10_orders", "j5_asof_last_purchase", "w4_rolling_avg_spend",
    "x1_crosstab_events", "g1_grouping_sets_orders",
    "u1_zscore_by_type_events", "jn1_json_map_events", "j6_brand_revenue",
    "j7_supplier_region_revenue", "s2_setops_priority_rows",
    "n1_exact_dedup_documents", "n2_text_stats_documents",
    "n3_topk_cosine_embeddings", "n4_jaccard_pairs_documents",
    "cc1_components_documents", "n6_simhash_documents",
    "st1_streaming_window_counts", "st2_streaming_sessions",
    "st3_streaming_dedup_count", "u2_name_digitsum_customers",
})

# Small always-run regression set of established queries, one per tier
# (relational agg, join, window, dedup, streaming) — kept ahead of the
# never-verified block so a capped pass still cross-checks prior rounds.
CANARIES = ("a1_pricing_summary", "j1_revenue_by_segment",
            "w1_top_order_per_customer", "n1_exact_dedup_documents",
            "st1_streaming_window_counts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (relational tier in
    queryset.py, LLM-data-pipeline tier in queryset_nstar.py).

    Iteration order is deliberate: the driver's oracle pass caps at 50
    queries, so the slots are rationed — a 5-query established canary set
    first, then every oracle query that has never received a driver
    correctness row (the round-3 lesson: ordering established queries first
    guaranteed new work was never driver-verified), then the remaining
    already-verified oracles, and rows-only queries (which get the weaker
    check regardless) last.
    """
    from agent_data_wrangler_spark.queryset import ORACLE as O1, QUERIES as Q1
    from agent_data_wrangler_spark.queryset_nstar import ORACLE as O2, QUERIES as Q2

    q = {**Q1, **Q2}
    o = {**O1, **O2}
    canaries = [k for k in CANARIES if k in q]
    unverified = [k for k in q if k in o and k not in DRIVER_VERIFIED]
    verified = [k for k in q
                if k in o and k in DRIVER_VERIFIED and k not in CANARIES]
    rows_only = [k for k in q if k not in o]
    return {k: q[k] for k in canaries + unverified + verified + rows_only}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query.
    Rows-only queries (hash-function-dependent LSH/MinHash/SimHash paths)
    intentionally have no entry — the driver records the weaker check."""
    from agent_data_wrangler_spark.queryset import ORACLE
    from agent_data_wrangler_spark.queryset_nstar import ORACLE as NSTAR

    return {**ORACLE, **NSTAR}
