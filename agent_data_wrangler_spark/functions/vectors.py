"""Vector math over ``array<float|double>`` columns — built-in higher-order
functions only (``zip_with`` + ``aggregate``), so similarity scoring runs
JVM-side with no Arrow crossing. Used by the similarity-search and
embedding-dedup operators (north-star tier, SURVEY §2.7).

At 100 TB scale this matters: a brute-force cosine top-k over N embeddings is a
broadcast of the query vector + one map-side pass + a TakeOrderedAndProject —
no shuffle at all; keeping the math in codegen keeps it scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then sum, as one higher-order expression."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (|a||b|); null-safe via nullif on zero norms."""
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
