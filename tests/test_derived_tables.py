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
    """One build per (session, source identity): the second call reads the
    same parquet artifact (identical input files, no rewrite), and the
    build's temporary persist is released (the graph operators' ledger
    contract)."""
    spark.catalog.clearCache()
    e1, p1 = derived.trade_graph_tables(spark, str(sf_dir))
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    first_paths = derived._TRADE_GRAPH[derived._cache_dir(str(sf_dir))]
    mtimes = {
        os.path.join(d, f): os.path.getmtime(os.path.join(d, f))
        for d in first_paths for f in os.listdir(d)
    }
    e2, p2 = derived.trade_graph_tables(spark, str(sf_dir))
    assert derived._TRADE_GRAPH[derived._cache_dir(str(sf_dir))] \
        == first_paths
    assert set(e2.inputFiles()) == set(e1.inputFiles())
    assert set(p2.inputFiles()) == set(p1.inputFiles())
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, (
            f"memoized call rewrote the artifact: {p}")


def test_rollup_rebuilds_on_source_mutation(spark, sf_dir, tmp_path):
    """A regenerated source (same directory, new file content/mtime) must
    trigger a REBUILD, never a stale read — the cache key and the session
    memo are both derived from per-file source identity, so in-place
    re-generation mid-session (a gen_sf re-run) changes the key."""
    import shutil as sh

    src = tmp_path / "sf"
    src.mkdir()
    for t in ("lineitem", "orders"):
        sh.copy(os.path.join(str(sf_dir), f"{t}.parquet"),
                src / f"{t}.parquet")
    base1 = derived._cache_dir(str(src))
    e1, _ = derived.trade_graph_tables(spark, str(src))
    files1 = set(e1.inputFiles())

    # In-place rewrite: same path, new mtime (content identical is fine —
    # identity is (mtime, size), the conservative side).
    os.utime(src / "lineitem.parquet", ns=(1, 1))
    base2 = derived._cache_dir(str(src))
    assert base2 != base1, "source mutation did not change the cache key"
    e2, _ = derived.trade_graph_tables(spark, str(src))
    assert set(e2.inputFiles()) != files1, (
        "mutated source was served the stale rollup artifact")
    assert base2 in derived._TRADE_GRAPH
    for b in (base1, base2):
        sh.rmtree(b, ignore_errors=True)


def test_cache_root_is_per_user_and_private(sf_dir):
    """The artifact root is uid-scoped and 0700 (ADVICE r10: a fixed
    world-predictable /tmp path lets another local user pre-publish a
    poisoned artifact that passes the _SUCCESS completeness check)."""
    root = derived._cache_root()
    assert str(os.getuid()) in os.path.basename(root)
    assert (os.stat(root).st_mode & 0o777) == 0o700
    assert derived._cache_dir(str(sf_dir)).startswith(root + os.sep)


def test_cache_root_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("ADW_CACHE_DIR", str(tmp_path / "cache"))
    assert derived._cache_root() == str(tmp_path / "cache")
    assert os.path.isdir(tmp_path / "cache")


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
