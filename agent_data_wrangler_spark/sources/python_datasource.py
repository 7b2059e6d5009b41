"""Custom connector via Spark 4's Python Data Source API — the engine's
"integrate an external system" surface (REST feeds, proprietary stores,
queue snapshots) without writing a JVM DataSource V2.

The demo source here is a deterministic synthetic generator, chosen so the
connector's OUTPUT is oracle-checkable: every value is pure integer
arithmetic on ``doc_id`` that DuckDB ``generate_series`` reproduces exactly
(Knuth multiplicative hash mod 1000 — no floats until the final division).

Scale model: ``partitions()`` returns one ``InputPartition`` per shard and
Spark schedules one task per partition — parallelism is the connector's
shard count, exactly like file splits for a parquet scan. Each task runs
``read()`` independently (no driver funnel); at 100 TB the same shape
points shards at external range queries (id ranges, Kafka partitions, S3
prefixes). Rows stream out of a generator — nothing is materialized
per-partition beyond the current row.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Knuth's 2^32 multiplicative-hash constant: spreads sequential ids.
_MULT = 2654435761


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("shards", 8)`` source.

    Options: ``shards`` (partition count, default 4) and ``rows_per_shard``
    (default 250).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, shard int, payload string, score_milli bigint"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            shards=int(self.options.get("shards", 4)),
            rows_per_shard=int(self.options.get("rows_per_shard", 250)),
        )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, shards: int, rows_per_shard: int) -> None:
        self.shards = shards
        self.rows_per_shard = rows_per_shard

    def partitions(self) -> list[InputPartition]:
        # One Spark task per shard — the connector's parallelism contract.
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = partition.value
        base = shard * self.rows_per_shard
        for i in range(self.rows_per_shard):
            doc_id = base + i
            score_milli = (doc_id * _MULT) % 1000
            yield (doc_id, shard, f"doc-{doc_id}", score_milli)


def register(spark) -> None:
    """Idempotent per-session registration (re-register is a no-op swap)."""
    spark.dataSource.register(SyntheticDocsDataSource)
