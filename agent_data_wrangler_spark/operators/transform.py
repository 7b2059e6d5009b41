"""Column transforms T7-T13 (SURVEY §2.4): string/date normalization and
canonicalization.

Evidence in the reference: whitespace-padded names (dirty.csv:5), case variants
('canada'→'Canada', graph_proj/README.md:109), typo canonicalization
('enginr'→'Engineer', 'Germny'→'Germany'; dirty.csv value sets), mixed phone
formats (dirty.csv:2-18), dual-format dates (SURVEY §1.2), N/A sentinels
(dirty.csv:35).

Scale notes: all of these are pure Column expressions (codegen, no UDF, no
shuffle). ``canonicalize_map`` supports two strategies: an inline CASE chain
for small dictionaries (free — folded into the scan projection) and a
broadcast-join against a mapping table for large dictionaries (still
shuffle-free: the dict broadcasts). Fuzzy canonicalization joins on
levenshtein distance against a broadcast canonical list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agent_data_wrangler_spark.functions.dates import DEFAULT_DATE_FORMATS, to_date_multi
from agent_data_wrangler_spark.functions.strings import (
    normalize_bool,
    normalize_phone,
    null_if_sentinel,
)


def trim_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """T7: strip leading/trailing whitespace."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out


def normalize_case(df: DataFrame, columns: list[str], style: str = "title") -> DataFrame:
    """T8: consistent capitalization ('canada'→'Canada'). styles: title
    (initcap), lower, upper."""
    fn = {"title": F.initcap, "lower": F.lower, "upper": F.upper}[style]
    out = df
    for c in columns:
        out = out.withColumn(c, fn(F.col(c)))
    return out


def canonicalize_map(
    df: DataFrame,
    column: str,
    mapping: dict[str, str],
    case_insensitive: bool = True,
    broadcast_threshold: int = 64,
) -> DataFrame:
    """T9: typo/synonym canonicalization via a mapping dict.

    Small dicts inline as a CASE chain (constant-folded by Catalyst); larger
    dicts become a broadcast left join against a mapping table, preserving
    unmapped values.
    """
    key = F.trim(F.lower(F.col(column))) if case_insensitive else F.col(column)
    norm_map = {(k.strip().lower() if case_insensitive else k): v for k, v in mapping.items()}
    if len(norm_map) <= broadcast_threshold:
        expr = None
        for raw, canon in norm_map.items():
            clause = (key == F.lit(raw), F.lit(canon))
            expr = F.when(*clause) if expr is None else expr.when(*clause)
        return df.withColumn(column, expr.otherwise(F.col(column)))
    spark = df.sparkSession
    map_df = spark.createDataFrame(list(norm_map.items()), schema=f"__raw string, __canon string")
    joined = df.join(
        F.broadcast(map_df), on=key == F.col("__raw"), how="left"
    )
    return joined.withColumn(column, F.coalesce(F.col("__canon"), F.col(column))).drop(
        "__raw", "__canon"
    )


def canonicalize_fuzzy(
    df: DataFrame, column: str, canonical: list[str], max_distance: int = 2
) -> DataFrame:
    """T9 fuzzy variant: map values to the nearest canonical value within a
    levenshtein threshold (broadcast join + min-distance pick, deterministic
    tie-break by canonical value ascending)."""
    spark = df.sparkSession
    canon_df = spark.createDataFrame([(c,) for c in canonical], schema="__canon string")
    # Unique row id so the best-match window (a) never collapses identical
    # input rows and (b) shuffles on a compact long, not the whole row.
    tagged = df.withColumn("__rid", F.monotonically_increasing_id())
    key = F.trim(F.lower(F.col(column)))
    dist = F.levenshtein(key, F.lower(F.col("__canon")))
    joined = tagged.join(F.broadcast(canon_df), on=dist <= max_distance, how="left").withColumn(
        "__dist", F.levenshtein(key, F.lower(F.col("__canon")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__rid").orderBy(F.asc_nulls_last("__dist"), F.asc("__canon"))
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return best.withColumn(column, F.coalesce(F.col("__canon"), F.col(column))).drop(
        "__canon", "__dist", "__rn", "__rid"
    )


def parse_dates(df: DataFrame, columns: list[str], formats=DEFAULT_DATE_FORMATS) -> DataFrame:
    """T10: string→date with multi-format fallback; failure → null."""
    out = df
    for c in columns:
        out = out.withColumn(c, to_date_multi(F.col(c), formats))
    return out


def parse_bools(df: DataFrame, columns: list[str]) -> DataFrame:
    """T9/T10: Y/N/Yes/No → boolean."""
    out = df
    for c in columns:
        out = out.withColumn(c, normalize_bool(F.col(c)))
    return out


def normalize_phones(df: DataFrame, columns: list[str]) -> DataFrame:
    """T11."""
    out = df
    for c in columns:
        out = out.withColumn(c, normalize_phone(F.col(c)))
    return out


def strip_na_sentinels(df: DataFrame, columns: list[str], cast_to: str | None = None) -> DataFrame:
    """T13: literal 'N/A'/'NA' strings → null (then optionally cast)."""
    out = df
    for c in columns:
        cleaned = null_if_sentinel(F.col(c))
        out = out.withColumn(c, cleaned.cast(cast_to) if cast_to else cleaned)
    return out


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """T12: bulk rename."""
    out = df
    for old, new in mapping.items():
        out = out.withColumnRenamed(old, new)
    return out
