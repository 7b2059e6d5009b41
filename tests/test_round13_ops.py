"""Round-13 contract hardening (r12 ADVICE items): nullability-normalized
schema compatibility on ANN appends, and case-insensitive / value-optional
tracking-parameter stripping in URL canonicalization.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from agent_data_wrangler_spark.operators import similarity, web


def _vecs(spark, ids, dim=8):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_append_accepts_nullability_divergent_delta(spark, tmp_path):
    """array<float> with containsNull=false vs the layout's containsNull=true
    is representation noise (parquet vs Arrow provenance), not a type
    divergence — the append must accept it. Before the r13 fix the strict
    DataType equality rejected it with an error whose two simpleString()
    sides read identically."""
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(_vecs(spark, range(40)), "embedding", path, n_lists=4)
    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType(), False), False),
        ]
    )
    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(8)])
        for i in range(100, 110)
    ]
    delta = spark.createDataFrame(rows, schema)
    assert similarity.append_ivf_partitioned(delta, "embedding", path) == 10
    rep = similarity.audit_ivf_layout(
        spark,
        path,
        _vecs(spark, range(40)).unionByName(_vecs(spark, range(100, 110))),
        id_col="vec_id",
    )
    assert rep["fresh_ok"] is True and rep["n_indexed"] == 50


def _canon(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(web.canonical_url("url").alias("c"))
        .collect()[0]["c"]
    )


def test_tracking_params_case_insensitive_and_bare(spark):
    """Real crawl URLs vary tracking-param case and sometimes carry bare
    flags with no '=' — both must be stripped (r12 ADVICE)."""
    assert (
        _canon(spark, "https://h.example.com/a?UTM_SOURCE=x&id=1")
        == "https://h.example.com/a?id=1"
    )
    assert (
        _canon(spark, "https://h.example.com/a?gclid&id=1")
        == "https://h.example.com/a?id=1"
    )
    assert (
        _canon(spark, "https://h.example.com/a?FbClId=z&Gclid=g&id=1")
        == "https://h.example.com/a?id=1"
    )
    # a non-tracking param that merely CONTAINS a tracking name must survive
    assert (
        _canon(spark, "https://h.example.com/a?xgclid=1&id=1")
        == "https://h.example.com/a?id=1&xgclid=1"
    )


# ---------------------------------------------------------------------------
# ur1 url provenance — three implementations of the messy-URL formula
# (tools/gen_sf.py:_synth_url baked into scaled dirs, the inline Spark
# Column derivation for the url-less driver testdata, and the DuckDB twin)
# must be byte-identical, or oracle parity would silently depend on which
# input path a run took.
# ---------------------------------------------------------------------------


def _gen_sf_synth_url():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_sf",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_sf.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._synth_url


def test_ur1_url_formula_pinned_across_implementations(spark, sf_dir):
    import duckdb

    from agent_data_wrangler_spark.queryset_nstar import _UR1_RAW_SQL, _ur1_raw_urls
    from agent_data_wrangler_spark.queryset import read_table

    synth = _gen_sf_synth_url()
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    spark_urls = {
        r["doc_id"]: r["url"] for r in _ur1_raw_urls(d).collect()
    }
    con = duckdb.connect()
    import os

    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    duck_urls = dict(con.sql(_UR1_RAW_SQL).fetchall())
    assert spark_urls == duck_urls
    assert all(u == synth(i) for i, u in spark_urls.items())


def test_gen_sf_emits_url_column_matching_formula(tmp_path):
    import subprocess
    import sys

    import duckdb

    out = tmp_path / "sfmini"
    subprocess.run(
        [
            sys.executable,
            "tools/gen_sf.py",
            "--src",
            "/root/testdata/sf0.001",
            "--out",
            str(out),
            "--mult",
            "2",
            "--tables",
            "documents",
        ],
        check=True,
        cwd="/root/repo",
    )
    synth = _gen_sf_synth_url()
    rows = duckdb.sql(
        f"SELECT doc_id, url FROM '{out}/documents.parquet'"
    ).fetchall()
    assert len(rows) == 1000  # 500 docs x mult 2
    assert all(u == synth(d) for d, u in rows)
