"""Units for the round-6 continuation (third session) operators: XML
source/sink, product quantization, and the survival/RFM analytics shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_xml_roundtrip_escaping_nulls_and_versioning(spark, tmp_path):
    """The XML sink/scan pair must survive markup-hostile values (&, <, >),
    preserve NULLs (absent element -> NULL), round-trip inferred types, and
    obey the S2 no-overwrite versioning contract."""
    from agent_data_wrangler_spark.sources.readers import read_xml
    from agent_data_wrangler_spark.sources.writers import write_versioned

    rows = [
        (1, "plain", 1.5),
        (2, 'needs <escaping> & "quotes"', None),
        (3, None, -0.25),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string, v double")
    base = str(tmp_path / "out.xml")
    p1 = write_versioned(df, base, fmt="xml")
    back = read_xml(spark, p1)
    assert back.schema.simpleString() == "struct<id:bigint,s:string,v:double>"
    assert sorted(back.collect()) == sorted(df.collect())
    # versioned: second write lands in a NEW path, first is untouched
    p2 = write_versioned(df, base, fmt="xml")
    assert p2 != p1
    assert read_xml(spark, p1).count() == 3


def test_xml_explicit_schema_skips_inference(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from agent_data_wrangler_spark.sources.readers import read_xml
    from agent_data_wrangler_spark.sources.writers import write_versioned

    df = spark.createDataFrame([(7,), (9,)], "id bigint")
    p = write_versioned(df, str(tmp_path / "ids.xml"), fmt="xml")
    schema = StructType([StructField("id", LongType())])
    back = read_xml(spark, p, schema=schema)
    assert back.schema == schema
    assert {r.id for r in back.collect()} == {7, 9}


# ---------------------------------------------------------------------------
# Product quantization: the raw-path semantics the verdict oracle cannot
# pin (it only gates recall) — encode bounds/nulls, ADC == numpy LUT math,
# and exact recovery on planted structure.
# ---------------------------------------------------------------------------
def _toy_vectors(spark, n=60, dim=8, seed=3):
    import math as _m

    rows = [
        (i, [round(_m.sin(seed * (i * dim + j) + 1), 6) for j in range(dim)])
        for i in range(n)
    ]
    rows.append((n, None))  # null vector must not break encode/score
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_pq_encode_bounds_nulls_and_determinism(spark):
    from agent_data_wrangler_spark.operators import similarity

    df = _toy_vectors(spark)
    books = similarity.pq_fit_codebooks(df, "embedding", m=4, ksub=8)
    assert len(books) == 4 and all(len(b) <= 8 for b in books)
    coded = df.withColumn("pqc", similarity.pq_encode("embedding", books))
    rows = {r.vec_id: r.pqc for r in coded.collect()}
    assert rows[60] is None  # null vector -> null code
    for vid, code in rows.items():
        if code is not None:
            assert len(code) == 4 and all(0 <= c < 8 for c in code)
    books2 = similarity.pq_fit_codebooks(df, "embedding", m=4, ksub=8)
    assert books == books2  # fit is deterministic (no RNG)


def test_pq_adc_matches_numpy_lut(spark):
    import numpy as np

    from agent_data_wrangler_spark.operators import similarity

    df = _toy_vectors(spark).filter(F.col("embedding").isNotNull())
    books = similarity.pq_fit_codebooks(df, "embedding", m=4, ksub=8)
    q = [0.3, -1.2, 0.8, 0.05, -0.4, 0.9, -0.7, 0.2]
    got = (
        df.withColumn("pqc", similarity.pq_encode("embedding", books))
        .withColumn("adc", similarity.pq_adc_score("pqc", books, q))
        .select("vec_id", "pqc", "adc")
        .collect()
    )
    qn = np.asarray(q) / np.linalg.norm(q)
    dsub = 2
    for r in got:
        lut = sum(
            float(np.dot(books[j][r.pqc[j]], qn[j * dsub : (j + 1) * dsub]))
            for j in range(4)
        )
        assert abs(lut - r.adc) < 1e-9


def test_pq_topk_recovers_planted_neighbors(spark):
    """Vectors clustered around 4 orthogonal axes; querying along one axis
    must return exactly that cluster's members first (PQ cells align with
    real structure, so even ADC alone is clean here — the planted twin of
    the measured-recall claim on unstructured bench vectors)."""
    from agent_data_wrangler_spark.operators import similarity

    dim, per = 8, 12
    rows = []
    for axis in range(4):
        for i in range(per):
            v = [0.0] * dim
            v[axis * 2] = 1.0
            v[axis * 2 + 1] = 0.02 * (i - per // 2)  # small within-cluster spread
            rows.append((axis * per + i, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = [0.0] * dim
    q[2] = 1.0  # axis 1
    got = similarity.topk_cosine_pq(
        df, "embedding", q, k=per, m=4, ksub=8, shortlist=2 * per,
        payload_cols=["vec_id"],
    ).collect()
    assert {r.vec_id for r in got} == {per + i for i in range(per)}


def test_km1_matches_hand_computed_kaplan_meier(spark, tmp_path):
    """Planted cohort with known KM table: durations {1,1,2,3,3} where the
    2-day user is censored (last event inside the final-7-days horizon).
    t=1: S = 1*(1-2/5) = 0.6 ; t=2: censored only, no row ; t=3: n_risk=2
    (censoring removed the 2-day user from later risk sets), d=2, S=0."""
    import datetime as dt

    from agent_data_wrangler_spark.queryset import QUERIES

    base = dt.datetime(2024, 1, 1)

    def ev(uid, day):
        return (uid, base + dt.timedelta(days=day))

    rows = [
        ev(1, 0), ev(1, 1),        # churn, duration 1
        ev(2, 0), ev(2, 1),        # churn, duration 1
        ev(3, 25), ev(3, 27),      # duration 2, last >= max-7d -> CENSORED
        ev(4, 0), ev(4, 3),        # churn, duration 3
        ev(5, 10), ev(5, 13),      # churn, duration 3
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        QUERIES["km1_survival_users_events"](spark, str(tmp_path)).collect()
    )
    assert [tuple(r) for r in got] == [(1, 5, 2, 0.6), (3, 2, 2, 0.0)]


def test_cu1_finds_planted_mean_shift(spark, tmp_path):
    """30 days of orders at 100.00/day, then 30 days at 200.00/day — the
    scaled-CUSUM max must land exactly on the last low-regime day."""
    import datetime as dt

    from agent_data_wrangler_spark.queryset import QUERIES

    base = dt.datetime(1995, 1, 1)
    rows = []
    for d in range(60):
        price = 100.0 if d < 30 else 200.0
        rows.append((d, d, "O", price, base + dt.timedelta(days=d), "1-URGENT"))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = QUERIES["cu1_changepoint_daily_orders"](spark, str(tmp_path)).collect()
    assert got[0].day == dt.date(1995, 1, 30)  # day index 29: last 100.00 day
    # |N*cs - t*total| at t=30: |60*3000_00*... | exact integer check
    assert got[0].abs_scaled_cusum == abs(60 * 30 * 10000 - 30 * (30 * 10000 + 30 * 20000))


def test_mk1_hand_computed_transitions(spark, tmp_path):
    import datetime as dt

    from agent_data_wrangler_spark.queryset import QUERIES

    base = dt.datetime(2024, 1, 1)
    seq = [  # user 1: a->b->a ; user 2: a->b
        (1, 1, "a", 0), (2, 1, "b", 1), (3, 1, "a", 2),
        (4, 2, "a", 0), (5, 2, "b", 1),
    ]
    rows = [
        (eid, base + dt.timedelta(hours=h), uid, et, 1.0, "{}")
        for eid, uid, et, h in seq
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in QUERIES["mk1_markov_transitions_events"](spark, str(tmp_path)).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_stream_outer_join_eviction_semantics(spark, tmp_path):
    """Pins the emission rule st9's oracle encodes: with the global
    watermark W = min(per-side max event time) - delay, an unmatched left
    row emits iff left_ts + max_delay < W (STRICT); the boundary row and
    everything later stays pending in state. Matched pairs always emit."""
    import datetime as dt

    from agent_data_wrangler_spark.streaming import (
        run_available_now,
        stream_interval_join_outer,
    )

    base = dt.datetime(2024, 1, 1)
    clicks = [
        (0, base - dt.timedelta(hours=2)),  # bound 23:00 prev day < W -> expired row
        (1, base),                          # bound 01:00 == W -> pending (strict)
        (2, base + dt.timedelta(minutes=1)),  # matched -> emits regardless
        (9, base + dt.timedelta(hours=10)),   # far future -> pending
    ]
    purchases = [
        (2, base + dt.timedelta(minutes=2)),
        (99, base + dt.timedelta(hours=1, minutes=1)),  # sets right max: W = 01:00
    ]
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    spark.createDataFrame(clicks, "c_user bigint, c_ts timestamp").write.parquet(cdir)
    spark.createDataFrame(purchases, "p_user bigint, p_ts timestamp").write.parquet(pdir)
    cs = spark.readStream.schema("c_user bigint, c_ts timestamp").parquet(cdir)
    ps = spark.readStream.schema("p_user bigint, p_ts timestamp").parquet(pdir)
    joined = stream_interval_join_outer(
        cs, ps, [("c_user", "p_user")],
        left_time="c_ts", right_time="p_ts",
        max_delay="1 HOUR", watermark="1 minute",
    )
    prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        run_available_now(joined, "oj_sem", str(tmp_path / "ckpt"))
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev)
    got = {(r.c_user, r.p_user) for r in spark.table("oj_sem").collect()}
    assert got == {(0, None), (2, 2)}
