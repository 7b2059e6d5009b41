"""Golden replay of the reference's FIRST pipeline (fixture 1,
``customers_dirty`` — models ``graph_proj/src/agent/dirty.csv``): 205 rows
with 5 exact duplicates, 11 raw country variants of 5 canonical values, mixed
phone formats, MM/DD/YYYY dates with planted future dates, N/A salary
sentinels with right-tail outliers, 4 subscribed encodings.

Asserts the FIXTURES.md invariants: exact-dedup removes exactly 5 rows;
country canonicalization converges to the 5 canonical values; phone
normalization produces a uniform format; future-date validation (injected
as_of, never wall clock) flags exactly the planted rows; N/A parses to null;
p95 capping bounds the planted outlier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agent_data_wrangler_spark.operators import filters, impute, transform
from agent_data_wrangler_spark.plans import Pipeline, Stage
from agent_data_wrangler_spark.sources.readers import read_csv

CANON_COUNTRIES = ["Canada", "Mexico", "USA", "UK", "Germany"]
COUNTRY_VARIANTS = [
    "Canada", "canada", "Mexico", "mexico", "USA", "United States",
    "UK", "U.K.", "Germany", "Germny", " Germny",
]
PHONES = ["035-721-9686", "(673)260-2673", "1811968548", "+1-079-220-1256x89001"]
FUTURE_DATES = {"12/01/2031", "06/15/2032"}


def customers_csv_text() -> str:
    header = "ID,Name,Email,Age,Date Joined,Country,Phone Number,Salary,Job Title,Subscribed"
    lines = [header]
    state = 777

    def nxt() -> float:
        nonlocal state
        state = (1664525 * state + 1013904223) % (2**32)
        return state / 2**32

    subs = ["Y", "N", "Yes", "No", ""]
    jobs = ["Engineer", "enginr", "Designer", "Desginer", "Data Analyst", "data analyst", ""]
    rows = []
    for i in range(200):
        age = "" if nxt() < 0.66 else str(round(19 + 46 * nxt(), 1))
        if i == 0:
            date = "12/01/2031"  # planted future
        elif i == 1:
            date = "06/15/2032"  # planted future
        elif nxt() < 0.1:
            date = ""
        else:
            date = f"{1 + i % 12:02d}/{1 + i % 28:02d}/{2015 + i % 9}"
        country = COUNTRY_VARIANTS[i % len(COUNTRY_VARIANTS)]
        phone = PHONES[i % len(PHONES)]
        if i == 5:
            salary = "983923"  # right-tail outlier (cap target)
        elif i % 12 == 0:
            salary = "N/A"
        elif nxt() < 0.05:
            salary = ""
        else:
            salary = str(round(30000 + 40000 * nxt(), 2))
        name = f"  Customer {i} " if i % 7 == 0 else f"Customer {i}"
        rows.append(
            f'{i + 1},{name},c{i}@example.com,{age},{date},{country},"{phone}",{salary},'
            f"{jobs[i % len(jobs)]},{subs[i % len(subs)]}"
        )
    # 5 exact duplicate rows (205 rows, 200 distinct IDs)
    rows.extend(rows[10:15])
    lines.extend(rows)
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def customers(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("cust") / "dirty.csv"
    p.write_text(customers_csv_text())
    df = read_csv(spark, str(p))
    df.cache().count()
    return df


def test_shape_and_na_sentinel(customers):
    assert customers.count() == 205
    # N/A parsed to null at read time, so Salary inferred numeric
    assert dict(customers.dtypes)["Salary"] in ("double", "int")
    assert customers.filter(F.col("Salary").isNull()).count() >= 17


def test_exact_dedup_removes_exactly_five(customers):
    # FIXTURES.md golden: customers_dirty exact-dedup removes exactly 5 rows
    deduped = filters.drop_duplicate_rows(customers)
    assert customers.count() - deduped.count() == 5


def test_country_canonicalization_converges(customers):
    pipe = Pipeline(
        "country_clean",
        [
            Stage("trim", transform.trim_columns, {"columns": ["Country"]}),
            Stage(
                "canon_map",
                transform.canonicalize_map,
                {"column": "Country", "mapping": {
                    "canada": "Canada", "mexico": "Mexico", "usa": "USA",
                    "united states": "USA", "uk": "UK", "u.k.": "UK",
                    "germany": "Germany",
                }},
            ),
            Stage(
                "canon_fuzzy",
                transform.canonicalize_fuzzy,
                {"column": "Country", "canonical": CANON_COUNTRIES, "max_distance": 2},
            ),
        ],
    )
    out = pipe.run(customers).df
    got = {r.Country for r in out.select("Country").distinct().collect()}
    assert got == set(CANON_COUNTRIES)  # 11 raw variants -> 5 canonical


def test_phone_normalization_uniform(customers):
    out = transform.normalize_phones(customers, ["Phone Number"])
    vals = {r["Phone Number"] for r in out.select("Phone Number").distinct().collect()}
    # all phones normalize to +<digits> or digits with extension preserved
    import re

    assert all(re.fullmatch(r"\+?\d+(x\d+)?", v) for v in vals), vals


def test_future_date_validation(customers):
    parsed = transform.parse_dates(customers, ["Date Joined"], formats=["MM/dd/yyyy"])
    flagged = parsed.filter(F.col("Date Joined") > F.to_date(F.lit("2026-01-01")))
    assert flagged.count() == len(FUTURE_DATES)  # exactly the planted futures
    kept = filters.future_date_filter(parsed, "Date Joined", as_of="2026-01-01")
    assert kept.count() == parsed.filter(F.col("Date Joined").isNotNull()).count() - len(FUTURE_DATES)


def test_salary_cap_bounds_outlier(customers):
    capped = impute.cap_percentile(customers, ["Salary"], p=0.95)
    mx = capped.agg(F.max("Salary")).first()[0]
    assert mx < 983923


def test_subscribed_bool_parse(customers):
    out = transform.parse_bools(customers, ["Subscribed"])
    assert dict(out.dtypes)["Subscribed"] == "boolean"
    vals = {r.Subscribed for r in out.select("Subscribed").distinct().collect()}
    assert vals == {True, False, None}


def test_declarative_spec_replays_full_clean(customers):
    """The ENTIRE fixture-1 cleaning sequence as ONE from_spec JSON pipeline
    (round-tripped through json.dumps to prove the spec is pure data — the
    deterministic compilation target an LLM planner would emit, reference
    tool_call_agent.py:91-171). Same golden invariants as the per-operator
    tests above, but driven end-to-end through Pipeline.run with the S5
    event log checked stage by stage."""
    import json as _json

    from agent_data_wrangler_spark.plans.pipeline import Pipeline

    spec = _json.loads(_json.dumps([
        {"stage": "dedup", "op": "drop_duplicate_rows"},
        {"stage": "trim", "op": "trim_columns",
         "params": {"columns": ["Country", "Name"]}},
        {"stage": "country_map", "op": "canonicalize_map",
         "params": {"column": "Country", "mapping": {
             "canada": "Canada", "mexico": "Mexico", "usa": "USA",
             "united states": "USA", "uk": "UK", "u.k.": "UK",
             "germany": "Germany"}}},
        {"stage": "country_fuzzy", "op": "canonicalize_fuzzy",
         "params": {"column": "Country", "canonical": CANON_COUNTRIES,
                    "max_distance": 2}},
        {"stage": "phones", "op": "normalize_phones",
         "params": {"columns": ["Phone Number"]}},
        {"stage": "dates", "op": "parse_dates",
         "params": {"columns": ["Date Joined"], "formats": ["MM/dd/yyyy"]}},
        {"stage": "no_future", "op": "future_date_filter",
         "params": {"date_col": "Date Joined", "as_of": "2026-01-01"}},
        {"stage": "cap_salary", "op": "cap_percentile",
         "params": {"columns": ["Salary"], "p": 0.95}},
        {"stage": "bools", "op": "parse_bools",
         "params": {"columns": ["Subscribed"]}},
    ]))
    pipe = Pipeline.from_spec("fixture1_full_clean", spec, count_rows=True)
    result = pipe.run(customers)
    out = result.df

    # Golden: 205 → 200 after exact dedup (FIXTURES.md), then the 2 planted
    # future dates drop in no_future (plus rows whose date failed to parse).
    by_stage = {e["stage"]: e for e in result.events if e["event"] == "stage_end"}
    assert by_stage["dedup"]["rows_in"] == 205
    assert by_stage["dedup"]["rows_out"] == 200
    dropped_by_validation = (
        by_stage["no_future"]["rows_in"] - by_stage["no_future"]["rows_out"]
    )
    assert dropped_by_validation >= len(FUTURE_DATES)
    assert out.filter(F.col("Date Joined") > F.lit("2026-01-01").cast("date")).count() == 0

    # 11 raw country variants → exactly the 5 canonical values.
    got = {r.Country for r in out.select("Country").distinct().collect()}
    assert got == set(CANON_COUNTRIES)

    # Phones uniform, salary outlier capped, Subscribed a real boolean.
    import re

    vals = [r["Phone Number"] for r in out.select("Phone Number").distinct().collect()]
    assert all(re.fullmatch(r"\+?\d+(x\d+)?", v) for v in vals), vals
    assert out.agg(F.max("Salary")).first()[0] < 983923
    assert dict(out.dtypes)["Subscribed"] == "boolean"

    # S5 event log is a faithful recipe: every stage logged with its params.
    starts = [e for e in result.events if e["event"] == "stage_start"]
    assert [e["stage"] for e in starts] == [s["stage"] for s in spec]
    assert starts[2]["params"]["mapping"]["united states"] == "USA"
