"""Property-based parity tests (hypothesis): operator semantics checked
against independent pandas computations on generated inputs — catches edge
cases (empty groups, all-null columns, ties, boundary timestamps) that
fixture tests miss. Example counts are kept small: every example is a full
Spark job."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import filters, impute, joins

# derandomize=True: the suite is a CI gate — examples must be the same on
# every run so "green" is reproducible (r05 verdict). Exploration happens in
# dev runs by flipping this off locally, never in the committed gate.
SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# allow_subnormal=False: at subnormal magnitudes (e.g. 5e-324) numpy's
# linear-interpolated percentile and Spark's exact `percentile` round the
# interpolation differently, so parity models diverge on values no real
# dataset contains (r05 verdict item 1; pinned in
# test_mad_filter_subnormal_regression below).
finite_doubles = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    allow_subnormal=False,
    width=64,
)


@settings(**SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000), st.one_of(st.none(), finite_doubles)),
        min_size=1,
        max_size=30,
    )
)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    left = [(k, t * 1_000_000) for k, t, _ in data]
    right = [(k, t * 1_000_000 + 500_000, v) for k, t, v in data if v is not None]
    # unique (key,time) on the right for deterministic matches
    seen, uniq_right = set(), []
    for k, t, v in right:
        if (k, t) not in seen:
            seen.add((k, t))
            uniq_right.append((k, t, v))
    ldf = spark.createDataFrame(left, "k int, t long").select(
        "k", F.timestamp_micros("t").alias("lt")
    )
    rdf = spark.createDataFrame(uniq_right or [(99, 0, 0.0)], "k int, t long, v double").select(
        "k", F.timestamp_micros("t").alias("rt"), "v"
    )
    out = joins.asof_join(ldf, rdf, key="k", left_time="lt", right_time="rt", right_values=["v"])
    got = sorted((r.k, r.lt, r.v_asof) for r in out.collect())

    lp = pd.DataFrame([(k, pd.Timestamp(t, unit="us")) for k, t in left], columns=["k", "lt"]).sort_values("lt")
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t, unit="us"), v) for k, t, v in (uniq_right or [(99, 0, 0.0)])],
        columns=["k", "rt", "v"],
    ).sort_values("rt")
    merged = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k", direction="backward")
    want = sorted(
        (int(r.k), r.lt.to_pydatetime(), None if pd.isna(r.v) else float(r.v))
        for r in merged.itertuples()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    vals=st.lists(st.one_of(st.none(), finite_doubles), min_size=2, max_size=50),
    k=st.sampled_from([1.0, 2.0, 3.0]),
)
def test_sigma_filter_matches_pandas(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    kept = filters.sigma_outlier_filter(df, ["v"], k=k)
    got = sorted(r.v for r in kept.collect() if r.v is not None)

    s = pd.Series(vals, dtype="float64")
    m, sd = s.mean(), s.std(ddof=1)
    if pd.isna(sd) or pd.isna(m):
        want = sorted(v for v in vals if v is not None)
    else:
        want = sorted(v for v in vals if v is not None and (m - k * sd) <= v <= (m + k * sd))
    assert got == pytest.approx(want)


@settings(**SETTINGS)
@given(vals=st.lists(st.one_of(st.none(), finite_doubles), min_size=1, max_size=40))
def test_median_fill_matches_pandas_interpolated_median(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    filled = impute.fill_median(df, ["v"])
    got_filled = [r.v for r in filled.collect()]
    s = pd.Series(vals, dtype="float64")
    med = s.median()  # pandas interpolated median == Spark F.percentile(0.5)
    if pd.isna(med):
        assert all(v is None for v in got_filled)
    else:
        assert sorted(got_filled) == pytest.approx(
            sorted(s.fillna(med).tolist())
        )


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=" abcdefgh\t", min_size=0, max_size=40), min_size=1, max_size=20
    )
)
def test_fingerprint_whitespace_invariance(spark, texts):
    from agent_data_wrangler_spark.functions.text import fingerprint, token_count

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        fingerprint("t").alias("fp"),
        fingerprint(F.regexp_replace(F.col("t"), r"\s+", "  ")).alias("fp2"),
        token_count("t").alias("tc"),
    ).collect()
    for r, t in zip(out, texts):
        assert r.fp == r.fp2  # whitespace-collapse invariant
        assert r.tc == len(t.split())  # whitespace token count == str.split


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
    ),
    gap=st.integers(1, 100),
)
def test_sessionize_matches_pandas_cumsum(spark, events, gap):
    # unique (user, second) so the tie-break column is irrelevant to the
    # property; pandas reference: per-user sorted diff > gap → cumsum.
    uniq = sorted(set(events))
    rows = [(u, i, t * 1_000_000) for i, (u, t) in enumerate(uniq)]
    df = spark.createDataFrame(rows, "uid int, eid int, us long").select(
        "uid", "eid", F.timestamp_micros("us").alias("ts")
    )
    from agent_data_wrangler_spark.operators.windows import sessionize

    out = sessionize(df, ["uid"], "ts", gap_seconds=gap, tiebreak=["eid"])
    got = {(r["uid"], r["eid"]): r["session_id"] for r in out.collect()}

    pdf = pd.DataFrame(uniq, columns=["uid", "t"])
    pdf["eid"] = [i for i, _ in enumerate(uniq)]
    want = {}
    for uid, grp in pdf.groupby("uid"):
        grp = grp.sort_values("t")
        new = (grp["t"].diff().isna()) | (grp["t"].diff() > gap)
        sess = new.cumsum()
        for eid, s in zip(grp["eid"], sess):
            want[(uid, eid)] = int(s)
    assert got == want


@settings(**SETTINGS)
@given(
    vals=st.lists(st.one_of(st.none(), finite_doubles), min_size=2, max_size=50),
    k=st.floats(min_value=1.0, max_value=5.0, allow_nan=False),
)
def test_mad_filter_matches_numpy(spark, vals, k):
    import numpy as np

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    kept = sorted(
        r.x for r in filters.mad_outlier_filter(df, "x", k=k).collect() if r.x is not None
    )
    arr = np.array([v for v in vals if v is not None], dtype=float)
    if arr.size == 0:
        assert kept == []
        return
    med = float(np.percentile(arr, 50, method="linear"))
    mad = float(np.percentile(np.abs(arr - med), 50, method="linear"))
    lo, hi = med - k * 1.4826 * mad, med + k * 1.4826 * mad
    want = sorted(v for v in arr if lo <= v <= hi)
    assert kept == pytest.approx(want)


def test_mad_filter_subnormal_regression(spark):
    """Pins the Hypothesis-found falsifying example vals=[0.0, 5e-324], k=1.0
    (r05 verdict item 1). At the smallest subnormal double, numpy's
    `percentile(..., method="linear")` rounds the interpolated median to 0.0
    (round-half-to-even on 2.5e-324) while Spark's exact `percentile` yields
    5e-324 — both are defensible IEEE-754 results, so numpy-parity is
    undefined here. The agreed engine semantics: the filter's keep-bounds are
    Spark's own exact percentile arithmetic, applied as a closed interval.
    This test pins that self-consistency directly."""
    vals, k = [0.0, 5e-324], 1.0
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    med = df.select(F.expr("percentile(x, 0.5)").alias("med")).collect()[0].med
    mad = df.select(
        F.expr(f"percentile(abs(x - {med!r}), 0.5)").alias("mad")
    ).collect()[0].mad
    lo, hi = med - k * 1.4826 * mad, med + k * 1.4826 * mad
    want = sorted(v for v in vals if lo <= v <= hi)
    kept = sorted(
        r.x for r in filters.mad_outlier_filter(df, "x", k=k).collect() if r.x is not None
    )
    assert kept == want


_word = st.text(alphabet="abcxyz0", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=24).map(" ".join)


def _py_tokens(text: str) -> list[str]:
    return text.lower().split()


@settings(**SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_repetition_stats_match_python_model(spark, docs):
    """dup_ngram_fraction / top_token_fraction / mean_token_len vs direct
    Python computation on generated word soups (repeats, empties, unicode-free
    short words — the shapes the Column folds must handle)."""
    from agent_data_wrangler_spark.functions.text import (
        dup_ngram_fraction,
        mean_token_len,
        top_token_fraction,
    )

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i int, text string")
    got = {
        r["i"]: (r["d2"], r["t1"], r["ml"])
        for r in df.select(
            "i",
            dup_ngram_fraction("text", n=2).alias("d2"),
            top_token_fraction("text").alias("t1"),
            mean_token_len("text").alias("ml"),
        ).collect()
    }
    for i, d in enumerate(docs):
        toks = _py_tokens(d)
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        want_d2 = round(1.0 - len(set(grams)) / len(grams), 6) if grams else 0.0
        want_t1 = (
            round(max(toks.count(u) for u in set(toks)) / len(toks), 6) if toks else 0.0
        )
        want_ml = (sum(len(t) for t in toks) / len(toks)) if toks else None
        d2, t1, ml = got[i]
        assert d2 == pytest.approx(want_d2, abs=1e-9), (d, d2, want_d2)
        assert t1 == pytest.approx(want_t1, abs=1e-9), (d, t1, want_t1)
        if want_ml is None:
            assert ml is None
        else:
            assert ml == pytest.approx(want_ml, abs=1e-9), (d, ml, want_ml)


@settings(**SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_winnow_fingerprints_match_python_model(spark, docs):
    """Winnowing selection vs a direct Python implementation of the same
    k-gram md5-prefix + min-per-window rule (including the short-doc
    global-min fallback and the sub-k empty case)."""
    import hashlib

    from agent_data_wrangler_spark.functions.text import winnow_fingerprints

    k, w = 3, 2
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i int, text string")
    got = {
        r["i"]: set(r["fps"])
        for r in df.select(
            "i", winnow_fingerprints("text", k=k, w=w).alias("fps")
        ).collect()
    }
    for i, d in enumerate(docs):
        toks = _py_tokens(d)
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest()[:8] for g in grams]
        if not hs:
            want = set()
        elif len(hs) < w:
            want = {min(hs)}
        else:
            want = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
        assert got[i] == want, (d, got[i], want)


@settings(**SETTINGS)
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True))
def test_hash_split_matches_python_md5(spark, ids):
    """hash_split's assignment vs direct Python md5 arithmetic over the same
    boundary table — pins the exact bucket rule, not just the distribution."""
    import hashlib

    from agent_data_wrangler_spark.operators.splits import hash_split, split_boundaries

    fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    got = {r["k"]: r["split"] for r in hash_split(df, "k", fractions).collect()}
    bounds = split_boundaries(fractions)
    for i in ids:
        bucket = hashlib.md5(f"split-v1:{i}".encode()).hexdigest()[:8]
        want = next((lbl for lbl, hi in bounds[:-1] if bucket <= hi), bounds[-1][0])
        assert got[i] == want, (i, bucket, got[i], want)


@settings(**SETTINGS)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 9), finite_doubles), min_size=0, max_size=15,
        unique_by=lambda t: t[0],
    ),
    changes=st.lists(
        st.tuples(
            st.integers(0, 12),                     # key (some beyond base)
            finite_doubles,                         # new value
            st.sampled_from(["U", "D", "I"]),       # op
            st.integers(0, 5),                      # seq
        ),
        min_size=0, max_size=20,
        unique_by=lambda t: (t[0], t[3]),           # one op per (key, seq)
    ),
)
def test_apply_changes_matches_reference_model(spark, base, changes):
    """CDC MERGE vs an independent Python model: per key, the highest-seq
    change wins; delete drops; anything else upserts; untouched keys pass."""
    from agent_data_wrangler_spark.operators import cdc

    bdf = spark.createDataFrame(base or [(99, 0.0)], "k int, v double")
    if not base:
        bdf = bdf.filter(F.lit(False))
    cdf = spark.createDataFrame(
        changes or [(99, 0.0, "U", 0)], "k int, v double, op string, seq int"
    )
    if not changes:
        cdf = cdf.filter(F.lit(False))

    got = sorted(
        tuple(r) for r in
        cdc.apply_changes(bdf, cdf, "k", seq_col="seq", op_col="op").collect()
    )

    model = {k: v for k, v in base}
    latest: dict[int, tuple[int, float, str]] = {}
    for k, v, op, seq in changes:
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, v, op)
    for k, (_, v, op) in latest.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == sorted(model.items())


@settings(**SETTINGS)
@given(
    series=st.lists(finite_doubles, min_size=1, max_size=8),
)
def test_ewma_matches_pandas_property(spark, series):
    """Below the lookback the bounded EWMA must equal pandas
    ewm(adjust=True) at EVERY row, for arbitrary finite series."""
    from agent_data_wrangler_spark.operators.windows import ewma

    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(series)], "k int, i int, v double"
    )
    got = [
        r["ewma"]
        for r in ewma(df, ["k"], ["i"], "v", alpha=0.4, lookback=10)
        .orderBy("i")
        .collect()
    ]
    want = pd.Series(series).ewm(alpha=0.4, adjust=True).mean().tolist()
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9, abs=1e-9)


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abcz", min_size=0, max_size=5), min_size=0, max_size=12
    ),
)
def test_bp1_pair_counts_match_python_model(spark, tmp_path_factory, words):
    """BPE pair counting vs a direct python model over arbitrary short
    words — pins the single-char guard, empty tokens, and case folding."""
    from collections import Counter

    from agent_data_wrangler_spark.queryset_nstar import QUERIES

    text = " ".join(words)
    tmp = tmp_path_factory.mktemp("bp1")
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp / "documents.parquet"))

    model = Counter()
    for w in text.lower().split():
        for i in range(len(w) - 1):
            model[w[i : i + 2]] += 1
    top = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))[:30]

    got = [
        (r["pair"], r["cnt"])
        for r in QUERIES["bp1_bpe_pair_counts_documents"](
            spark, str(tmp)
        ).collect()
    ]
    assert got == top


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_matches_numpy_power_iteration(spark, edges):
    """pagerank (fixed-iteration mode) vs an independent numpy power
    iteration with the same dangling-mass redistribution, on generated
    digraphs (self-loops, parallel edges, dangling nodes, disconnected
    nodes all arise). Invariants: Σr = 1, every r ≥ (1-d)/N, per-node match
    to 1e-9."""
    import numpy as np

    es = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(es, "src bigint, dst bigint")

    from agent_data_wrangler_spark.operators.graph import pagerank

    got = {r["node"]: r["r"]
           for r in pagerank(df, num_iters=12).collect()}

    nodes = sorted({n for e in es for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in es:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    d, tp = 0.85, 0.15
    for _ in range(12):
        contrib = np.zeros(n)
        for a, b in es:
            contrib[idx[b]] += r[idx[a]] / out[idx[a]]
        dangling = sum(r[i] for i in range(n) if out[i] == 0)
        r = tp / n + d * (contrib + dangling / n)
    assert set(got) == set(nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for node in nodes:
        assert got[node] >= tp / n - 1e-12
        assert abs(got[node] - r[idx[node]]) < 1e-9, (node, es)


def _brute_jaccard_pairs(texts, k=3, threshold=0.5):
    """Brute-force word-k-gram Jaccard over every pair — the independent
    model for both exact set-similarity engines (inverted index, PPJoin)."""
    def sh(text):
        toks = text.lower().split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    shs = {i: sh(t) for i, t in texts}
    out = {}
    ids = sorted(shs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            u = shs[a] | shs[b]
            if not u:
                continue
            j = round(len(shs[a] & shs[b]) / len(u), 6)
            if j >= threshold:
                out[(a, b)] = j
    return out


_WORDS = ["red", "blue", "fox", "dog", "jumps", "runs", "fast", "slow"]


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8)
        .map(lambda ws: " ".join(ws)),
        min_size=2, max_size=10,
    )
)
def test_exact_set_similarity_engines_complete_and_sound(spark, docs):
    """COMPLETENESS + SOUNDNESS of both exact set-similarity engines on
    generated tiny-vocab corpora (high shingle overlap by construction,
    plus empty docs and sub-k docs): the inverted-index path and the
    PPJoin prefix-filter path must BOTH return exactly the brute-force
    J >= t pair set with matching Jaccard values. This is the property the
    prefix bound's floor-vs-ceil reasoning claims in the docstring —
    falsified here if the prefix is ever one shingle too short."""
    from agent_data_wrangler_spark.operators import dedup

    texts = list(enumerate(docs))
    want = _brute_jaccard_pairs(texts, k=3, threshold=0.5)
    df = spark.createDataFrame(texts, "doc_id bigint, text string")

    for engine in (dedup.near_dup_pairs_exact, dedup.near_dup_pairs_prefix):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in engine(
                df, "doc_id", "text", k=3, threshold=0.5
            ).collect()
        }
        assert got == want, (engine.__name__, sorted(got), sorted(want), docs)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1, max_size=25,
    )
)
def test_connected_components_both_paths_match_union_find(spark, edges):
    """Both cc strategies — the driver union-find AND the distributed
    min-label propagation (forced via local_edge_limit=0) — must produce
    the exact smallest-id-per-component labeling of an independent Python
    union-find, on generated graphs with self-loops, parallel edges, and
    multiple components."""
    from agent_data_wrangler_spark.operators import dedup

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical labels: smallest member id per component
    members = {}
    for n in parent:
        members.setdefault(find(n), set()).add(n)
    want = {n: min(members[find(n)]) for n in parent}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    local = {r["id"]: r["component_id"]
             for r in dedup.connected_components(df).collect()}
    dist = {r["id"]: r["component_id"]
            for r in dedup.connected_components(
                df, local_edge_limit=0).collect()}
    assert local == want, (sorted(local.items()), sorted(want.items()))
    assert dist == want, (sorted(dist.items()), sorted(want.items()))


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)),
                  min_size=0, max_size=25),
    right=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)),
                   min_size=0, max_size=8),
)
def test_salted_join_equals_plain_join(spark, left, right):
    """Salting is a physical rewrite: for every supported mode the result
    multiset must be IDENTICAL to the plain join — duplicates on both
    sides, hot keys, empty sides, unmatched rows. Modes are looped inside
    the test (a drawn mode + derandomized small example count could leave
    a mode permanently uncovered)."""
    from agent_data_wrangler_spark.operators.joins import salted_join

    l = spark.createDataFrame(left, "k int, lv int") if left else \
        spark.createDataFrame([], "k int, lv int")
    r = (spark.createDataFrame(right, "k int, rv int") if right else
         spark.createDataFrame([], "k int, rv int"))
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(tuple(x) for x in
                     salted_join(l, r, "k", salt=4, how=how).collect())
        want = sorted(tuple(x) for x in l.join(r, "k", how).collect())
        assert got == want, (how, got[:5], want[:5])


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2),            # partition key
                  st.integers(-50, 50),          # order col (ties!)
                  st.integers(-5, 5),            # v1
                  st.integers(0, 3)),            # v2
        min_size=0, max_size=40,
    )
)
def test_distributed_prefix_sums_match_plain_window(spark, rows):
    """The bucketed two-phase prefix sum must equal the plain (single
    reducer) window cumsum for every (exclusive, inclusive) x partitioned
    x unpartitioned combination, empty inputs included. Input is
    pre-aggregated to unique (partition, order) keys first — the operator's
    real consumers (ks1's value counts, ns1's corpus index) all feed
    unique-key frames, and with duplicate order values the per-row
    exclusive sums are documented tie-arbitrary in BOTH forms (not a
    defined output to compare)."""
    from pyspark.sql import Window

    from agent_data_wrangler_spark.operators.windows import (
        distributed_prefix_sums,
    )

    raw = (spark.createDataFrame(rows, "p int, o int, v1 int, v2 int")
           if rows else spark.createDataFrame([], "p int, o int, v1 int, v2 int"))
    for partition_by in (None, ["p"]):
        # uniquify the order key WITHIN each window partition — ties across
        # partitions are fine, ties inside one are the undefined case
        df = raw.groupBy(*(partition_by or []), "o").agg(
            F.sum("v1").cast("int").alias("v1"),
            F.sum("v2").cast("int").alias("v2"))
        if partition_by is None:
            df = df.select("o", "v1", "v2")
        for inclusive in (False, True):
            got_df = distributed_prefix_sums(
                df, ["v1", "v2"], "o", partition_by,
                n_buckets=4, aliases=["c1", "c2"], inclusive=inclusive)
            keys = (["p"] if partition_by else []) + ["o"]
            got = sorted(
                (tuple(r[k] for k in keys), r["c1"], r["c2"])
                for r in got_df.collect())
            w = Window.partitionBy(*(partition_by or [])).orderBy("o")
            w = w.rowsBetween(Window.unboundedPreceding,
                              0 if inclusive else -1)
            want_df = df.select(
                *keys,
                F.coalesce(F.sum("v1").over(w), F.lit(0)).alias("c1"),
                F.coalesce(F.sum("v2").over(w), F.lit(0)).alias("c2"))
            want = sorted(
                (tuple(r[k] for k in keys), r["c1"], r["c2"])
                for r in want_df.collect())
            # multiset equality per (partition, order-value): sort handles it
            assert got == want, (partition_by, inclusive, got[:5], want[:5])


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)),
        min_size=1, max_size=40,
    )
)
def test_two_phase_agg_equals_plain_groupby(spark, rows):
    """The salted two-phase aggregate must equal the plain groupBy for
    re-aggregatable functions (count/sum/min/max) on generated inputs —
    hot keys and negative values included. (Exact-integer functions, so
    no float association noise.)"""
    from agent_data_wrangler_spark.operators.joins import two_phase_agg

    df = spark.createDataFrame(rows, "k int, v int")
    got = sorted(
        tuple(r) for r in two_phase_agg(
            df, "k",
            {"n": (F.count, F.sum, "v"),
             "total": (F.sum, F.sum, "v"),
             "mn": (F.min, F.min, "v"),
             "mx": (F.max, F.max, "v")},
            salt=4,
        ).collect())
    want = sorted(
        tuple(r) for r in df.groupBy("k").agg(
            F.count("v").alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("mn"), F.max("v").alias("mx")).collect())
    assert got == want, (got[:5], want[:5])


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    points=st.lists(st.integers(-40, 40), min_size=1, max_size=25),
    intervals=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 30)),
        min_size=1, max_size=10,
    ),
    bucket=st.sampled_from([1.0, 3.0, 7.5, "auto"]),
)
def test_range_join_equals_naive_between(spark, points, intervals, bucket):
    """The bucket-exploded equi rewrite must return exactly the naive
    half-open BETWEEN join's pairs for every bucket width — boundary
    points, zero-length intervals, nested/overlapping intervals. (At
    bucket='auto' zero-mean-length interval sets raise, which the naive
    form can't mimic — skip those draws.)"""
    from agent_data_wrangler_spark.operators.joins import range_join

    ivs = [(i, s, s + ln) for i, (s, ln) in enumerate(intervals)]
    l = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid int, pt int")
    r = spark.createDataFrame(ivs, "iid int, lo int, hi int")
    if bucket == "auto" and all(ln == 0 for _, ln in intervals):
        with pytest.raises(ValueError, match="auto-size"):
            range_join(l, r, "pt", "lo", "hi", bucket=bucket)
        return
    got = sorted(
        (x["pid"], x["iid"])
        for x in range_join(l, r, "pt", "lo", "hi", bucket=bucket)
        .select("pid", "iid").collect())
    want = sorted(
        (pid, iid)
        for pid, p in enumerate(points)
        for iid, lo, hi in ivs
        if lo <= p < hi)
    assert got == want, (bucket, got[:6], want[:6])
