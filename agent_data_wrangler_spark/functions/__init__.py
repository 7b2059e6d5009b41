"""Scalar expression helpers — all built on ``pyspark.sql.functions`` so they
stay JVM-side inside whole-stage codegen (no Python in the hot path)."""

from agent_data_wrangler_spark.functions.dates import to_date_multi
from agent_data_wrangler_spark.functions.strings import (
    normalize_bool,
    normalize_phone,
    null_if_sentinel,
)
from agent_data_wrangler_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "to_date_multi",
    "normalize_bool",
    "normalize_phone",
    "null_if_sentinel",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
