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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


# ---------------------------------------------------------------------------
# JSONL sink/source with a real commit protocol (Spark 4 Python Data
# Source writer API) — the "write to an external system" half of the
# connector story. Each task streams its rows into a uniquely-named file
# (taskAttemptId — retried/speculative attempts write DISTINCT files) and
# returns a commit message; only files named in COMMITTED messages enter
# the _MANIFEST.json the driver writes last, so a crashed or duplicated
# task attempt can never leak rows into a read. Reads are manifest-driven:
# one InputPartition per committed file, stray files ignored. This is the
# same two-phase-commit shape FileOutputCommitter gives JVM sinks, built
# on the Python API.
# Scale: tasks write independently (no driver funnel); the driver handles
# |tasks| commit messages and one manifest rename. JSON-native column
# types only (the demo contract; parquet remains the primary format).
# ---------------------------------------------------------------------------

_MANIFEST = "_MANIFEST.json"


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int) -> None:
        self.filename = filename
        self.rows = rows


class JsonlManifestDataSource(DataSource):
    """``df.write.format("jsonl_manifest").option("path", dir).save()`` and
    ``spark.read.format("jsonl_manifest").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def schema(self):
        # Read path: the schema travels in the manifest, written at commit.
        import json
        import os

        from pyspark.sql.types import StructType as _St

        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_manifest requires option('path', ...)")
        mf = os.path.join(path, _MANIFEST)
        if not os.path.exists(mf):
            raise FileNotFoundError(f"no committed manifest at {mf}")
        with open(mf) as f:
            return _St.fromJson(json.load(f)["schema"])

    def reader(self, schema) -> "JsonlManifestReader":
        return JsonlManifestReader(self.options["path"], schema)

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":
        return JsonlManifestWriter(self.options["path"], schema, overwrite)


class JsonlManifestReader(DataSourceReader):
    def __init__(self, path: str, schema) -> None:
        import json
        import os

        self.path = path
        self.schema = schema
        with open(os.path.join(path, _MANIFEST)) as f:
            self.files = [e["name"] for e in json.load(f)["files"]]

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import json
        import os

        fields = self.schema.fields
        doubles = {f.name for f in fields if f.dataType.typeName() == "double"}
        with open(os.path.join(self.path, partition.value)) as f:
            for line in f:
                d = json.loads(line)
                yield tuple(
                    (float(d[f.name]) if f.name in doubles and d[f.name] is not None
                     else d[f.name])
                    for f in fields
                )


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool) -> None:
        self.path = path
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator) -> _JsonlCommit:
        import json
        import os

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        attempt = TaskContext.get().taskAttemptId()
        filename = f"part-{attempt}.jsonl"
        n = 0
        names = [f.name for f in self.schema.fields]
        with open(os.path.join(self.path, filename), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(names, row))) + "\n")
                n += 1
        return _JsonlCommit(filename, n)

    def commit(self, messages) -> None:
        import json
        import os

        committed = [m for m in messages if m is not None]
        entries = [{"name": m.filename, "rows": m.rows} for m in committed]
        mf = os.path.join(self.path, _MANIFEST)
        if not self.overwrite and os.path.exists(mf):
            with open(mf) as f:
                entries = json.load(f)["files"] + entries
        manifest = {
            "files": entries,
            "schema": self.schema.jsonValue(),
            "total_rows": sum(e["rows"] for e in entries),
        }
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mf)  # atomic publish — readers see old or new, never half
        if self.overwrite:
            # Old committed files are unreachable once the new manifest is
            # live — reclaim them (never before the publish: a crash between
            # delete and publish would corrupt the PREVIOUS version).
            keep = {e["name"] for e in entries} | {_MANIFEST}
            for name in os.listdir(self.path):
                if name.startswith("part-") and name not in keep:
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def register_jsonl_manifest(spark) -> None:
    """Idempotent per-session registration of the sink/source pair."""
    spark.dataSource.register(JsonlManifestDataSource)
