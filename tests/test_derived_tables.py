"""plans/derived.py — the materialized trade-graph rollup shared by
gr1/tr1/rx1 (r09 directive: their decade ratios grew because each query
re-derived the orders⋈lineitem pair expansion per invocation)."""

import os

import pytest
from pyspark.sql import functions as F

from agent_data_wrangler_spark.plans import derived
from agent_data_wrangler_spark.sources.readers import read_table


@pytest.fixture(autouse=True)
def _fresh_memo():
    """Each test sees a clean memo, and never poisons another test's."""
    saved = dict(derived._TRADE_GRAPH)
    derived._TRADE_GRAPH.clear()
    yield
    derived._TRADE_GRAPH.clear()
    derived._TRADE_GRAPH.update(saved)


def test_rollup_matches_direct_derivation(spark, sf_dir):
    """The materialized tables must be row-for-row identical to the
    from-scratch derivation the queries used to inline — the rollup is a
    cache, never a semantic change."""
    edges, pairs = derived.trade_graph_tables(spark, str(sf_dir))

    li = read_table(spark, str(sf_dir), "lineitem").select(
        "l_orderkey", "l_suppkey")
    o = read_table(spark, str(sf_dir), "orders").select(
        "o_orderkey", "o_custkey")
    op = li.distinct()
    want_edges = (
        op.join(o, op["l_orderkey"] == o["o_orderkey"])
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
        .distinct()
    )
    a = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_suppkey").alias("s1"))
    b = op.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_suppkey").alias("s2"))
    want_pairs = (
        a.join(b, "ok").filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2").agg(F.count(F.lit(1)).alias("w"))
    )
    assert edges.exceptAll(want_edges).isEmpty()
    assert want_edges.exceptAll(edges).isEmpty()
    assert pairs.exceptAll(want_pairs).isEmpty()
    assert want_pairs.exceptAll(pairs).isEmpty()


def test_rollup_memoizes_and_cleans_up(spark, sf_dir):
    """One build per (session, sf_dir): the second call reads the same
    parquet artifact (identical input files, no rewrite), and the build's
    temporary persist is released (the graph operators' ledger contract)."""
    spark.catalog.clearCache()
    e1, p1 = derived.trade_graph_tables(spark, str(sf_dir))
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    first_paths = derived._TRADE_GRAPH[str(sf_dir)]
    mtimes = {
        os.path.join(d, f): os.path.getmtime(os.path.join(d, f))
        for d in first_paths for f in os.listdir(d)
    }
    e2, p2 = derived.trade_graph_tables(spark, str(sf_dir))
    assert derived._TRADE_GRAPH[str(sf_dir)] == first_paths
    assert set(e2.inputFiles()) == set(e1.inputFiles())
    assert set(p2.inputFiles()) == set(p1.inputFiles())
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, (
            f"memoized call rewrote the artifact: {p}")


def test_graph_queries_scan_the_rollup(spark, sf_dir):
    """gr1/tr1/rx1's 100 TB claim: after the one-time build, their plans
    scan the small materialized edge tables — lineitem never reappears in
    a per-query plan."""
    from agent_data_wrangler_spark.queryset import QUERIES as Q1
    from agent_data_wrangler_spark.queryset_nstar import QUERIES as Q2

    derived.trade_graph_tables(spark, str(sf_dir))  # pay the build once
    for name in ("tr1_triangle_count", "rx1_recursive_reachability",
                 "dg1_cosupply_rollup_topk", "dg2_trade_edges_checksum"):
        q = {**Q1, **Q2}[name]
        df = q(spark, str(sf_dir))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # tr1's plan text carries the rollup path in its cached subtrees;
        # rx1's UnionLoop elides relation paths, but inputFiles() resolves
        # them — accept either witness, and ban lineitem in both.
        files = df.inputFiles()
        assert ("adw_trade_graph_" in plan
                or (files and all("adw_trade_graph_" in f for f in files))
                ), (name, plan, files)
        assert "lineitem" not in plan, (name, plan)


def test_dg1_is_topk_heap_over_rollup(spark, sf_dir):
    """dg1's 100 TB shape: a TakeOrderedAndProject heap straight over the
    materialized pair table — no global sort, no join, no lineitem."""
    from agent_data_wrangler_spark.queryset_nstar import QUERIES as Q2

    derived.trade_graph_tables(spark, str(sf_dir))
    plan = Q2["dg1_cosupply_rollup_topk"](spark, str(sf_dir)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "lineitem" not in plan, plan
