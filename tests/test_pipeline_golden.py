"""Golden replay (SURVEY §7 step 8): run the reference's two hr-cleaning
sequences end-to-end through the Pipeline runner — CSV ingestion (S1) →
operator stages → versioned sink (S2) → report (S4) → JSONL event log (S5) —
and assert the engineered golden invariants (see tests/fixtures_hr.py):

- seq 1: 500 -> 405 -> 396 rows
- seq 2: 500 -> 482 rows; promo placeholder == min(join_date) == 2015-08-05
- mean-fill writes EXACTLY the pre-fill column mean into every filled row
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import filters, impute
from agent_data_wrangler_spark.plans import Pipeline, Stage, render_report
from agent_data_wrangler_spark.sources.readers import read_csv
from agent_data_wrangler_spark.sources.writers import write_report, write_versioned
from tests.fixtures_hr import hr_dirty_csv_text


@pytest.fixture(scope="module")
def hr_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("hr") / "dirty_hr.csv"
    p.write_text(hr_dirty_csv_text())
    return str(p)


@pytest.fixture(scope="module")
def hr_df(spark, hr_csv):
    df = read_csv(spark, hr_csv)
    df.cache().count()
    return df


def test_csv_ingestion_shape_and_types(hr_df):
    assert hr_df.count() == 500
    types = dict(hr_df.dtypes)
    assert types["age"] == "double"
    assert types["salary"] == "double"
    assert types["employee_id"] == "int"
    # null-quirk rates per FIXTURES.md fixture 2 shape
    nulls = hr_df.select(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in ["age", "salary", "last_promo_date", "bonus_percent", "performance_score"]]
    ).first()
    assert nulls["last_promo_date"] == 95
    assert nulls["age"] == 7
    assert nulls["salary"] == 39
    assert nulls["bonus_percent"] == 6
    assert nulls["performance_score"] == 27


def test_golden_replay_sequence1(hr_df, tmp_path):
    log = str(tmp_path / "run.jsonl")
    pipe = Pipeline(
        "hr_clean_seq1",
        [
            Stage("sigma_filter_age_salary", filters.sigma_outlier_filter, {"columns": ["age", "salary"]}),
            Stage("drop_null_promo", filters.drop_null_rows, {"subset": ["last_promo_date"]}),
        ],
        log_path=log,
        count_rows=True,
    )
    res = pipe.run(hr_df)
    assert res.row_counts[-1][2] == 405  # golden: 500 -> 405

    further = Pipeline(
        "hr_clean_seq1_further",
        [Stage("sigma_refit_age_salary", filters.sigma_outlier_filter, {"columns": ["age", "salary"]})],
        log_path=log,
        count_rows=True,
    ).run(res.df)
    assert further.row_counts[-1][2] == 396  # golden: 405 -> 396

    # S5 event log: JSONL, one parseable object per line, carries the recipe
    with open(log, encoding="utf-8") as fh:
        events = [json.loads(line) for line in fh]
    assert [e["event"] for e in events if e["event"] == "pipeline_start"] == ["pipeline_start"] * 2
    stage_ends = [e for e in events if e["event"] == "stage_end"]
    assert stage_ends[0]["rows_in"] == 500
    assert stage_ends[1]["rows_out"] == 405
    assert any(e.get("params") == {"subset": ["last_promo_date"]} for e in events)

    # S4 report renders the row deltas
    report = render_report(res, title="HR cleaning report", notes=["3-sigma on age/salary, drop null promo"])
    assert "500 -> " in report and "405" in report
    path = write_report(report, str(tmp_path / "dirty_hr.csv"))
    assert path.endswith("dirty_hr_report.txt") and os.path.exists(path)


def test_golden_replay_sequence2(hr_df, tmp_path):
    pipe = Pipeline(
        "hr_clean_seq2",
        [
            Stage(
                "median_fill",
                impute.fill_median,
                {"columns": ["age", "salary", "bonus_percent", "performance_score"]},
            ),
            Stage("promo_min_join_date", impute.fill_min_of, {"target": "last_promo_date", "source": "join_date"}),
            Stage(
                "sigma_filter",
                filters.sigma_outlier_filter,
                {"columns": ["age", "salary", "bonus_percent"]},
            ),
        ],
        count_rows=True,
    )
    res = pipe.run(hr_df)
    assert res.row_counts[-1][2] == 482  # golden: 500 -> 482

    # golden: never-promoted placeholder is the minimum join_date
    placeholders = (
        res.df.filter(F.col("employee_id") <= 1095)  # the formerly-null block
        .select("last_promo_date")
        .distinct()
        .collect()
    )
    filled_values = {str(r.last_promo_date) for r in placeholders}
    assert "2015-08-05" in filled_values


def test_mean_fill_writes_exact_prefill_mean(hr_df):
    # The reference artifact stash/dirty_hr_clean.csv:2 shows the filled cell
    # carrying the full-precision pre-fill mean; assert the same invariant:
    # every filled cell equals fit_mean's value EXACTLY (bit-for-bit).
    fit = impute.fit_mean(hr_df, ["salary"])["salary"]
    filled = impute.fill_mean(hr_df, ["salary"])
    originally_null = filled.filter(F.col("age").isNotNull() | F.lit(True)).join(
        hr_df.filter(F.col("salary").isNull()).select("employee_id"), "employee_id"
    )
    values = {r.salary for r in originally_null.select("salary").distinct().collect()}
    assert values == {fit}
    # and the fit matches an independent high-precision computation
    import statistics

    py_mean = statistics.fmean(
        r.salary for r in hr_df.select("salary").collect() if r.salary is not None
    )
    assert fit == pytest.approx(py_mean, rel=1e-12)


def test_versioned_sink_never_overwrites(hr_df, tmp_path):
    base = str(tmp_path / "dirty_hr.csv")
    small = hr_df.limit(5)
    p1 = write_versioned(small, base, fmt="csv", single_file=True)
    p2 = write_versioned(small, base, fmt="csv", single_file=True)
    assert p1.endswith("dirty_hr_clean.csv")
    assert p2.endswith("dirty_hr_clean_v2.csv")
    assert os.path.exists(p1) and os.path.exists(p2)
    # re-writing from an already-versioned name still never overwrites
    p3 = write_versioned(small, p1, fmt="csv", single_file=True)
    assert p3.endswith("dirty_hr_clean_v3.csv")


def test_pipeline_from_declarative_spec(hr_df):
    # The spec is pure data (JSON-decodable) -> buildable, loggable, replayable
    registry = {
        "drop_null_rows": filters.drop_null_rows,
        "sigma_outlier_filter": filters.sigma_outlier_filter,
        "fill_median": impute.fill_median,
    }
    spec = [
        {"stage": "sigma", "op": "sigma_outlier_filter", "params": {"columns": ["age", "salary"]}},
        {"stage": "drop_promo_nulls", "op": "drop_null_rows", "params": {"subset": ["last_promo_date"]}, "cache": True},
    ]
    pipe = Pipeline.from_spec("spec_replay", spec, registry, count_rows=True)
    res = pipe.run(hr_df)
    assert res.row_counts[-1][2] == 405  # same golden result as the coded pipeline

    import pytest as _pytest

    with _pytest.raises(KeyError) as err:
        Pipeline.from_spec("bad", [{"op": "nope"}], registry)
    assert "nope" in str(err.value)


def test_default_registry_spec(hr_df):
    # no explicit registry: the spec addresses the operator library by name
    pipe = Pipeline.from_spec(
        "auto_registry",
        [{"op": "drop_null_rows", "params": {"subset": ["last_promo_date"]}}],
        count_rows=True,
    )
    assert pipe.run(hr_df).row_counts[-1][2] == 405

    from agent_data_wrangler_spark.plans.pipeline import default_registry

    reg = default_registry()
    # a sanity sample across modules
    for op in ["sigma_outlier_filter", "fill_median", "canonicalize_map",
               "drop_near_duplicates", "topk_cosine", "crosstab"]:
        assert op in reg, op
