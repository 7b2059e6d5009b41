"""ANSI-SQL surface over the engine's tables (SURVEY §7 build plan: "sql.py —
views + ANSI SQL").

The reference exposes no SQL (its only language is LLM-generated pandas);
this module is the Spark-native answer: register each testdata/pipeline table
once as a temp view and hand the string to Catalyst. Anything expressible in
portable ANSI SQL then runs unchanged on Spark AND on the DuckDB oracle —
``sq1_portable_sql_revenue`` executes the SAME query text on both engines,
which is the strongest possible parity statement for the SQL surface.

Scale: ``spark.sql`` plans are identical to DataFrame plans after analysis —
pushdown, pruning, AQE, broadcast all apply; registering a view is metadata
only (no scan, no cache).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from agent_data_wrangler_spark.sources.readers import read_table

#: The driver testdata catalog (TESTDATA.md).
DEFAULT_TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Session → (sf_dir, tables) CURRENTLY bound as temp views. A session holds
# exactly one binding at a time (createOrReplaceTempView replaces), so the
# memo must track the latest registration, not the set of all past ones — an
# append-only set keyed by id(spark) silently skipped re-registration after
# an A → B → A sf_dir switch (and id() can be reused after GC). WeakKey so a
# stopped/collected session never pins stale state onto its id's successor.
_BOUND: "weakref.WeakKeyDictionary[SparkSession, tuple[str, tuple[str, ...]]]"
_BOUND = weakref.WeakKeyDictionary()


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = DEFAULT_TABLES
) -> None:
    """Create/replace one temp view per table. No data scan, but each
    registration re-reads parquet footers (nano-timestamp probe), so repeat
    calls are skipped only while the SAME (sf_dir, tables) is still the
    session's current binding; any switch re-registers."""
    if _BOUND.get(spark) == (sf_dir, tables):
        return
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _BOUND[spark] = (sf_dir, tables)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the catalog and run one ANSI-SQL query through Catalyst."""
    register_views(spark, sf_dir)
    return spark.sql(query)
