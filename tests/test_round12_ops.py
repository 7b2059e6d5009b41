"""Round-12 contract hardening (r11 ADVICE items): append-time schema-type
validation on ANN serving layouts, and the degenerate-model fail-fast in the
bigram-LM scorer. Each guard turns a deferred/silent failure into an
immediate, named error at the call that caused it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import lm, similarity


def _vecs(spark, ids, dim=8, vec_type="array<float>", id_type="long"):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding {vec_type}"
    )


def test_ivf_append_rejects_dtype_divergent_delta(spark, tmp_path):
    """A delta whose column TYPES diverge from the sidecar schema_json used
    to append fine and only break later, inside _read_layout's
    explicit-schema read at probe/audit time. The append must fail fast."""
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(_vecs(spark, range(40)), "embedding", path, n_lists=4)
    delta = _vecs(spark, range(100, 110), vec_type="array<double>")
    with pytest.raises(ValueError, match="types diverge.*embedding"):
        similarity.append_ivf_partitioned(delta, "embedding", path)
    # the failed append must not have touched the layout
    rep = similarity.audit_ivf_layout(
        spark, path, _vecs(spark, range(40)), id_col="vec_id"
    )
    assert rep["fresh_ok"] is True and rep["n_indexed"] == 40


def test_ivf_append_rejects_divergent_id_type(spark, tmp_path):
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(_vecs(spark, range(40)), "embedding", path, n_lists=4)
    delta = _vecs(spark, range(100, 110), id_type="int")
    with pytest.raises(ValueError, match="types diverge.*vec_id"):
        similarity.append_ivf_partitioned(delta, "embedding", path)


def test_lsh_append_rejects_dtype_divergent_delta(spark, tmp_path):
    path = str(tmp_path / "lsh")
    similarity.write_lsh_bucketed(
        _vecs(spark, range(40)), "embedding", path, num_planes=4
    )
    delta = _vecs(spark, range(100, 110), vec_type="array<double>")
    with pytest.raises(ValueError, match="types diverge.*embedding"):
        similarity.append_lsh_bucketed(delta, "embedding", path)


def test_append_still_accepts_schema_subset_delta(spark, tmp_path):
    """Name-subset deltas stay legal (null-filled on read); only TYPE
    divergence is rejected."""
    path = str(tmp_path / "ivf")
    base = _vecs(spark, range(40)).withColumn("label", F.lit("b"))
    similarity.write_ivf_partitioned(base, "embedding", path, n_lists=4)
    assert (
        similarity.append_ivf_partitioned(
            _vecs(spark, range(100, 110)), "embedding", path
        )
        == 10
    )


def test_score_bigram_xent_fails_fast_on_empty_model(spark):
    """An empty train corpus yields vocab __v = 0; without the guard the
    probability divides by zero, log2 -> NULL, and avg() silently returns
    NULL xent_bits. The scorer must raise a named error instead."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    ev = spark.createDataFrame([(1, "some eval text here")], "doc_id long, text string")
    model, ctx, vocab = lm.bigram_lm(empty, "doc_id", "text")
    out = lm.score_bigram_xent(ev, model, ctx, vocab, "doc_id", "text")
    with pytest.raises(Exception, match="vocabulary is empty"):
        out.collect()


def test_score_bigram_xent_blank_train_also_fails_fast(spark):
    """Non-empty train rows whose text tokenizes to nothing are the same
    degenerate model."""
    blank = spark.createDataFrame([(1, "   "), (2, "")], "doc_id long, text string")
    ev = spark.createDataFrame([(1, "some eval text here")], "doc_id long, text string")
    model, ctx, vocab = lm.bigram_lm(blank, "doc_id", "text")
    with pytest.raises(Exception, match="vocabulary is empty"):
        lm.score_bigram_xent(ev, model, ctx, vocab, "doc_id", "text").collect()


# ---------------------------------------------------------------------------
# ivf_assign_multi (the SemDeDup cross-cluster recall lever, r12)
# ---------------------------------------------------------------------------

def test_ivf_assign_multi_first_element_is_single_assignment(spark):
    cents = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]]
    df = spark.createDataFrame(
        [(0, [0.9, 0.1]), (1, [0.1, 0.9]), (2, [0.6, 0.8])],
        "vec_id long, v array<double>",
    )
    out = df.select(
        "vec_id",
        similarity.ivf_assign("v", cents).alias("single"),
        similarity.ivf_assign_multi("v", cents, nprobe=2).alias("multi"),
    ).collect()
    for r in out:
        assert r["multi"][0] == r["single"]
        assert len(r["multi"]) == 2
        assert r["multi"][0] != r["multi"][1]


def test_ivf_assign_multi_catches_boundary_pair(spark):
    """The sd2 blind spot in miniature: a near-dup pair straddling the
    c0/c1 boundary is invisible single-probe (different lists) but its
    nearest-2 probe sets intersect."""
    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    df = spark.createDataFrame(
        [(0, [0.72, 0.69]), (1, [0.69, 0.72])], "vec_id long, v array<double>"
    )
    rows = df.select(
        similarity.ivf_assign("v", cents).alias("s"),
        similarity.ivf_assign_multi("v", cents, nprobe=2).alias("m"),
    ).collect()
    assert rows[0]["s"] != rows[1]["s"]                      # single-probe: missed
    assert set(rows[0]["m"]) & set(rows[1]["m"])             # multi-probe: caught


def test_ivf_assign_multi_pandas_path_matches_codegen(spark):
    """Above codegen_max_lists the Arrow path must produce identical probe
    lists, including the stable tie-break to the lower list id."""
    cents = [[float((i * 13 + j * 5) % 7) - 3.0 for j in range(4)] for i in range(6)]
    df = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 5) - 2.0 for j in range(4)]) for i in range(20)],
        "vec_id long, v array<double>",
    )
    codegen = df.select(
        "vec_id", similarity.ivf_assign_multi("v", cents, nprobe=3).alias("m")
    ).collect()
    arrow = df.select(
        "vec_id",
        similarity.ivf_assign_multi(
            "v", cents, nprobe=3, codegen_max_lists=2
        ).alias("m"),
    ).collect()
    assert {r["vec_id"]: list(r["m"]) for r in codegen} == {
        r["vec_id"]: list(r["m"]) for r in arrow
    }


def test_ivf_assign_multi_null_vector_gets_zero_lists(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame([(0, None)], "vec_id long, v array<double>")
    row = df.select(
        similarity.ivf_assign_multi("v", cents, nprobe=2).alias("m")
    ).collect()[0]
    assert list(row["m"]) == [0, 0]


# ---------------------------------------------------------------------------
# operators/web.py — URL canonicalization (ur1 surface)
# ---------------------------------------------------------------------------

def _canon(spark, url):
    from agent_data_wrangler_spark.operators import web

    return (
        spark.createDataFrame([(url,)], "url string")
        .select(
            web.canonical_url("url").alias("c"),
            web.registrable_domain("url").alias("d"),
        )
        .collect()[0]
    )


def test_canonical_url_folds_cosmetic_variants(spark):
    variants = [
        "HTTP://WWW.Site0.Example.COM:80/p/3/?utm_source=x&id=1#frag",
        "http://site0.example.com/p/3?id=1",
        "http://Site0.example.com:80/p/3/?id=1&utm_campaign=y",
    ]
    canons = {_canon(spark, u)["c"] for u in variants}
    assert canons == {"http://site0.example.com/p/3?id=1"}


def test_canonical_url_keeps_real_params_sorted(spark):
    r = _canon(spark, "https://h.example.com/a?z=1&a=2&utm_medium=m")
    assert r["c"] == "https://h.example.com/a?a=2&z=1"


def test_canonical_url_distinguishes_distinct_resources(spark):
    a = _canon(spark, "https://h.example.com/a?id=1")["c"]
    b = _canon(spark, "https://h.example.com/a?id=2")["c"]
    c = _canon(spark, "https://h.example.com/b?id=1")["c"]
    assert len({a, b, c}) == 3


def test_canonical_url_default_port_is_scheme_aware(spark):
    # :443 is NOT default for http — it must survive
    r = _canon(spark, "http://h.example.com:443/a")
    assert r["c"] == "http://h.example.com:443/a"


def test_canonical_url_non_url_is_null(spark):
    r = _canon(spark, "not a url at all")
    assert r["c"] is None and r["d"] is None


def test_registrable_domain_two_level_suffix(spark):
    assert _canon(spark, "https://www.shop.Foo.co.uk/x")["d"] == "foo.co.uk"
    assert _canon(spark, "https://a.b.example.com/x")["d"] == "example.com"
    assert _canon(spark, "https://localhost/x")["d"] == "localhost"


def test_root_path_normalizes_to_slash(spark):
    assert _canon(spark, "https://h.example.com")["c"] == "https://h.example.com/"
    assert _canon(spark, "https://h.example.com/")["c"] == "https://h.example.com/"


# ---------------------------------------------------------------------------
# li1 semantics — the classifier must actually identify the marker languages
# (oracle parity pins cross-engine equality; this pins that the answer is
# RIGHT where signal exists). Threshold 0.9 rather than 1.0 to tolerate
# testdata regeneration between rounds (the generator's text is drift-prone
# by design; the injected marker suffix dominates the profile regardless).
# ---------------------------------------------------------------------------

def test_li1_marker_language_accuracy(spark, sf_dir):
    from agent_data_wrangler_spark.functions.text import LANG_MARKERS
    from agent_data_wrangler_spark.queryset_nstar import QUERIES

    rows = QUERIES["li1_language_id_documents"](spark, sf_dir).collect()
    for code in LANG_MARKERS:
        n_ok = sum(r["n_docs"] for r in rows
                   if r["lang_true"] == code and r["lang_pred"] == code)
        n_all = sum(r["n_docs"] for r in rows if r["lang_true"] == code)
        assert n_all > 0, code
        assert n_ok / n_all >= 0.9, (code, n_ok, n_all)


# ---------------------------------------------------------------------------
# audit_lsh_layout — the LSH twin of the IVF freshness audit (r12)
# ---------------------------------------------------------------------------

def _lsh_layout(spark, tmp_path, n=40):
    path = str(tmp_path / "lsh")
    df = _vecs(spark, range(n))
    similarity.write_lsh_bucketed(df, "embedding", path, num_planes=4)
    return path, df


def test_lsh_audit_green_on_fresh_layout(spark, tmp_path):
    path, df = _lsh_layout(spark, tmp_path)
    rep = similarity.audit_lsh_layout(spark, path, df, id_col="vec_id")
    assert rep == {
        "n_source": 40, "n_indexed": 40, "n_missing": 0, "n_orphaned": 0,
        "stats_ok": True, "fresh_ok": True,
    }


def test_lsh_audit_append_merges_stats(spark, tmp_path):
    path, df = _lsh_layout(spark, tmp_path)
    delta = _vecs(spark, range(100, 115))
    assert similarity.append_lsh_bucketed(delta, "embedding", path) == 15
    rep = similarity.audit_lsh_layout(
        spark, path, df.unionByName(delta), id_col="vec_id"
    )
    assert rep["n_indexed"] == 55
    assert rep["stats_ok"] is True and rep["fresh_ok"] is True


def test_lsh_audit_detects_lost_partition(spark, tmp_path):
    import os
    import shutil

    path, df = _lsh_layout(spark, tmp_path)
    victim = sorted(
        d for d in os.listdir(path) if d.startswith("__bpart=")
    )[0]
    shutil.rmtree(os.path.join(path, victim))
    rep = similarity.audit_lsh_layout(spark, path, df, id_col="vec_id")
    assert rep["n_missing"] > 0
    assert rep["stats_ok"] is False and rep["fresh_ok"] is False


def test_lsh_audit_detects_bucket_rewrite(spark, tmp_path):
    """An in-place __bucket rewrite is count- and coverage-invisible but
    probe-poisoning — the stored __bucket column is in the checksum set
    precisely so this trips stats_ok."""
    import glob

    from pyspark.sql import functions as F2

    path, df = _lsh_layout(spark, tmp_path)
    part = sorted(glob.glob(f"{path}/__bpart=*"))[0]
    src = spark.read.parquet(part)
    # materialize BEFORE deleting the files (the write below would lazily
    # re-read them otherwise), then rewrite with the bucket shifted
    rewritten = spark.createDataFrame(src.collect(), src.schema).withColumn(
        "__bucket", F2.col("__bucket") + 1
    )
    for f in glob.glob(f"{part}/*.parquet"):
        import os
        os.remove(f)
    rewritten.coalesce(1).write.mode("append").parquet(part)
    rep = similarity.audit_lsh_layout(spark, path, df, id_col="vec_id")
    assert rep["n_missing"] == 0 and rep["n_orphaned"] == 0
    assert rep["stats_ok"] is False and rep["fresh_ok"] is False


def test_lsh_audit_rejects_ivf_layout(spark, tmp_path):
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(_vecs(spark, range(40)), "embedding", path, n_lists=4)
    with pytest.raises(ValueError, match="not an LSH"):
        similarity.audit_lsh_layout(spark, path, _vecs(spark, range(40)), id_col="vec_id")


# ---------------------------------------------------------------------------
# web.py properties: idempotence + cosmetic invariance, swept over a
# deterministic variant grid in ONE Spark job (hypothesis-per-example would
# pay a Spark job per case).
# ---------------------------------------------------------------------------

def test_canonicalization_idempotent_and_cosmetic_invariant(spark):
    from pyspark.sql import functions as F2

    from agent_data_wrangler_spark.operators import web

    bases = []
    for i in range(60):
        scheme = ["http", "https"][i % 2]
        host = f"h{i % 7}.example." + ["com", "co.uk", "org"][i % 3]
        path = ["", "/", f"/a/{i}", f"/a/{i}/"][i % 4]
        q = ["", f"?id={i % 5}", f"?z=1&id={i % 5}"][i % 3]
        bases.append(f"{scheme}://{host}{path}{q}")

    def mangle(u: str, k: int) -> str:
        scheme, rest = u.split("://", 1)
        hostpart, sep, tail = rest.partition("/")
        out = scheme.upper() if k % 2 else scheme
        out += "://" + ("www." if k % 3 == 0 else "")
        out += hostpart.upper() if k % 5 == 0 else hostpart
        if k % 4 == 0:
            out += ":443" if scheme == "https" else ":80"
        out += sep + tail
        # tracking params + fragment
        out += ("&" if "?" in out else "?") + f"utm_source=s{k}&gclid=g{k}"
        out += f"#frag{k}"
        return out

    rows = [(u, mangle(u, k)) for u in bases for k in range(1, 4)]
    df = spark.createDataFrame(rows, "base string, mangled string")
    checked = df.select(
        web.canonical_url("base").alias("cb"),
        web.canonical_url("mangled").alias("cm"),
        web.registrable_domain("base").alias("db"),
        web.registrable_domain("mangled").alias("dm"),
    ).withColumn("cc", web.canonical_url("cb"))
    bad = checked.filter(
        (F2.col("cb") != F2.col("cm"))          # cosmetic invariance
        | (F2.col("cc") != F2.col("cb"))        # idempotence
        | (F2.col("db") != F2.col("dm"))        # domain invariance
    )
    offenders = bad.limit(5).collect()
    assert not offenders, offenders
