"""Array / map / JSON scalar helpers (SURVEY §2.6 collection functions).

The reference reaches semi-structured data through pandas ``json`` accessors
inside its generated programs; Spark-side, everything here stays in codegen:
``get_json_object`` / ``from_json`` are JVM expressions, so JSON columns parse
inside the scan stage with zero Python.

Scale notes: prefer ``json_get`` (single-path extraction, no schema) for one
or two fields; ``json_to_map`` materializes the whole object per row — fine
for small objects, wasteful for wide ones. For hot paths over stable schemas,
parse ONCE into a struct column (``from_json`` with an explicit schema) and
let column pruning drop unused fields.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_get(col: Column | str, path: str) -> Column:
    """Extract one JSON path as string (``$.field`` syntax); null on miss or
    malformed input — the tolerant semantics cleaning pipelines want."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def json_get_typed(col: Column | str, path: str, dtype: str) -> Column:
    """``json_get`` + try_cast: parse failures and type mismatches → null."""
    return json_get(col, path).try_cast(dtype)


def json_to_map(col: Column | str) -> Column:
    """Whole-object parse into map<string,string> (keys unknown upfront)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, "map<string,string>")


def map_get(col: Column | str, key: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(c, key)


def sorted_keys(col: Column | str) -> Column:
    """Deterministic key listing (map iteration order is undefined)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_sort(F.map_keys(c))


def array_l2_normalize(col: Column | str) -> Column:
    """Normalize an array<numeric> to unit L2 norm (null-safe on zero)."""
    from agent_data_wrangler_spark.functions.vectors import l2_norm

    c = F.col(col) if isinstance(col, str) else col
    norm = F.nullif(l2_norm(c), F.lit(0.0))
    return F.transform(c, lambda x: x.cast("double") / norm)


def variant_get_typed(col, path: str, dtype: str):
    """Spark 4 VARIANT path extraction: parse once into the binary variant
    encoding, then ``variant_get`` with a target type. Versus string-path
    ``get_json_object`` (json_get_typed), the variant is parsed ONCE per row
    and each extraction is a binary traversal — the right engine path when a
    row yields several fields or the column is stored as VARIANT in the
    table. Both stay in whole-stage codegen.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.variant_get(F.parse_json(c), path, dtype)


def variant_schema(col):
    """Per-row inferred schema string of a JSON document via the VARIANT
    encoding (``schema_of_variant``) — the drift detector for
    semi-structured columns: group by this to see every shape in the data.
    """
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.schema_of_variant(F.parse_json(c))
