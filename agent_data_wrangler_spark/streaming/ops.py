"""Structured Streaming operators over `events`-shaped streams (SURVEY §2.7).

The reference is batch-only (one CSV per run); this tier is the engine's
answer to the same cleaning/aggregation semantics arriving continuously.
Designed against the standard Structured Streaming model: source → watermark
→ stateful op → sink, with state bounded by the watermark.

Scale notes (the parts that matter at a real event rate):
- Every stateful op here REQUIRES a watermark — unbounded state is the
  streaming OOM. The helpers take `watermark` explicitly rather than
  defaulting, so callers must decide their lateness budget.
- `windowed_agg` state is |keys|·|open windows|; tumbling windows expire at
  (window_end + watermark).
- `dedup_within_watermark` uses dropDuplicatesWithinWatermark — state holds
  one entry per key seen inside the watermark horizon, NOT forever (the
  plain dropDuplicates-on-stream trap).
- `sessionize_stateful` (applyInPandasWithState) is the custom-operator
  escape hatch: per-key pandas state with explicit timeout handling. Use
  `session_agg` (native session_window) when gap-close semantics suffice —
  it stays JVM-side.

Batch/stream parity: medians/modes and other blocking fits are NOT
streamable; streaming pipelines ship the stateless transforms plus these
windowed aggregates (documented divergence, SURVEY §7 risk list).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: picks up new files dropped into `path`.

    The schema is REQUIRED (streaming sources cannot infer). At scale the
    same call shape points at a Kafka/Kinesis source instead; everything
    downstream is source-agnostic."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def windowed_agg(
    sdf: DataFrame,
    time_col: str,
    window_duration: str,
    aggs: list[Column],
    *,
    keys: list[str] | None = None,
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling (or sliding, when `slide` given) window aggregate.

    Output includes window_start/window_end; late rows beyond `watermark`
    are dropped (deterministic given the same file arrival order)."""
    win = F.window(F.col(time_col), window_duration, slide) if slide else F.window(
        F.col(time_col), window_duration
    )
    grouped = sdf.withWatermark(time_col, watermark).groupBy(win, *(keys or []))
    out = grouped.agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def dedup_within_watermark(
    sdf: DataFrame,
    keys: list[str],
    time_col: str,
    watermark: str = "10 minutes",
    *,
    include_time: bool = False,
) -> DataFrame:
    """In-stream exact dedup with BOUNDED state (state expires with the
    watermark horizon) — the streaming twin of F3/exact dedup.

    Dedups on ``keys`` ALONE by default: the operator's primary use case is
    the same record re-delivered with a jittered event time, which a
    keys+time composite would never collapse. ``include_time=True`` opts into
    the stricter (key, event-time) identity for sources where the timestamp
    is part of the record key."""
    cols = keys + [time_col] if include_time else keys
    return sdf.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(cols)


def enrich_static(
    sdf: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static equi-join (enrichment): each micro-batch joins against
    the CURRENT snapshot of the static side. Stateless — no state store, no
    watermark requirement, any output mode.

    ``broadcast`` (default) hints the dim side: without it the static side
    re-shuffles on every micro-batch, which at a real event rate means one
    full dim shuffle per trigger. Stream-static supports inner and
    left-outer (stream side preserved); right/full would need the static
    side to know about not-yet-seen stream rows and are rejected by Spark
    itself.
    """
    d = F.broadcast(dim) if broadcast else dim
    return sdf.join(d, on=on, how=how)


def session_agg(
    sdf: DataFrame,
    time_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    *,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Native session windows (gap-based): sessions close when no event
    arrives within `gap`. JVM-side state — prefer this over the stateful
    pandas path when plain gap semantics are enough."""
    out = (
        sdf.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def sessionize_stateful(
    sdf: DataFrame,
    keys: list[str],
    func: Callable[[Any, Iterable[pd.DataFrame], GroupState], Iterator[pd.DataFrame]],
    output_schema: StructType | str,
    state_schema: StructType | str,
    *,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — arbitrary
    per-key state machines (sessionization with custom close rules, CEP-ish
    patterns, incremental models). `func(key, pdf_iter, state)` manages its
    own ``GroupState`` (get/update/remove + timeouts)."""
    return sdf.groupBy(*keys).applyInPandasWithState(
        func, outputStructType=output_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=timeout,
    )


def run_foreach_batch(
    sdf: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    output_mode: str | None = None,
):
    """Production sink pattern: ``foreachBatch`` hands each micro-batch to
    arbitrary BATCH code (versioned parquet writes, merge-into, multi-sink
    fan-out) with exactly-once bookkeeping via the checkpoint + batch id.
    This is how streaming runs land in the same versioned-sink layout the
    batch pipeline uses (sources/writers.py).

    Returns the StreamingQuery; with ``available_now`` (default) it blocks
    until the current data is drained, else the caller manages lifecycle."""
    writer = (
        sdf.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode or _default_mode(sdf))
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def run_available_now(
    sdf: DataFrame, query_name: str, checkpoint_dir: str, *, output_mode: str | None = None
) -> None:
    """Drain everything currently available into an in-memory table named
    `query_name`, then stop (Trigger.AvailableNow) — the deterministic test/
    backfill harness; production sinks swap format for kafka/parquet.

    ``output_mode`` defaults per plan shape: complete for aggregates, update
    for custom stateful ops, append otherwise."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode or _default_mode(sdf))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _default_mode(sdf: DataFrame) -> str:
    plan = sdf._jdf.queryExecution().analyzed().toString()
    if "FlatMapGroupsInPandasWithState" in plan:
        return "update"
    return "complete" if "Aggregate" in plan else "append"


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    *,
    left_time: str,
    right_time: str,
    max_delay: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER join with an event-time bound: pair each left row
    with right rows on the same key where
    ``left_time <= right_time <= left_time + max_delay`` (the
    click-then-purchase / request-then-response attribution shape).

    ``on`` is a list of (left_col, right_col) equality pairs — column names
    must be DISJOINT across the two sides (rename before calling; streaming
    self-joins of one source otherwise produce ambiguous lineage).

    State-bound mechanics (the 100 TB property): BOTH sides get a watermark,
    and the time-range condition lets Spark derive per-side state-eviction
    bounds — left rows are dropped once the right watermark passes
    left_time + max_delay; right rows once the left watermark passes
    right_time. Without the range condition the join would buffer both
    streams forever. Inner join output is append-mode by construction.
    """
    if not on:
        # None & Column would silently become a NULL condition (zero rows);
        # keyless time-only stream joins are a different (and state-heavy)
        # operation — reject the empty key list loudly.
        raise ValueError("stream_interval_join requires at least one key pair")
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = None
    for lc, rc in on:
        eq = l[lc] == r[rc]
        cond = eq if cond is None else (cond & eq)
    cond = (
        cond
        & (r[right_time] >= l[left_time])
        & (r[right_time] <= l[left_time] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner")


def stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    *,
    left_time: str,
    right_time: str,
    max_delay: str,
    watermark: str = "1 minute",
) -> DataFrame:
    """Stream-stream LEFT OUTER join with an event-time bound: like
    :func:`stream_interval_join`, plus a NULL-right row for every left row
    whose join window closed without a match — the abandoned-cart /
    request-without-response shape, and the hard state-eviction case.

    Emission semantics (pinned by tests/test_round6c_ops.py against a
    controlled cohort, and relied on by the st9 oracle):

    - matched pairs emit on arrival, exactly like the inner join;
    - an unmatched left row emits (with NULL right columns) only once the
      GLOBAL watermark passes STRICTLY beyond ``left_time + max_delay``;
      the global watermark is the MIN across both inputs
      (spark.sql.streaming.multipleWatermarkPolicy default), i.e.
      ``min(max seen left_time, max seen right_time) - watermark``;
    - left rows whose bound has not been passed stay PENDING in the state
      store (a later run against the same checkpoint emits them when new
      data advances the watermark) — they are not lost, just not yet due;
    - the final flush happens in AvailableNow's trailing no-data batch, so
      the drain MUST keep ``noDataMicroBatches`` enabled (pass
      ``no_data_batch=True`` to the drain helper) — with it disabled the
      watermark never advances past the last data batch and no unmatched
      row ever emits.

    Keep ``watermark`` small for outer joins: it is pure emission latency —
    every extra minute of delay widens the never-flushed tail.
    """
    if not on:
        raise ValueError("stream_interval_join_outer requires at least one key pair")
    l = left.withWatermark(left_time, watermark)
    r = right.withWatermark(right_time, watermark)
    cond = None
    for lc, rc in on:
        eq = l[lc] == r[rc]
        cond = eq if cond is None else (cond & eq)
    cond = (
        cond
        & (r[right_time] >= l[left_time])
        & (r[right_time] <= l[left_time] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "leftOuter")


def transform_with_state_supported() -> bool:
    """Probe for the ``transformWithStateInPandas`` runtime prerequisites.

    Spark 4's TWS lane serializes state through protobuf; on clusters
    without ``google.protobuf`` in the Python environment the API import
    itself fails. The st6 twin (``user_totals_tws``) registers only when
    this returns True, so environments without protobuf keep a clean
    registry instead of a query that dies at runtime (round-6 directive:
    detection-gated, not stubbed)."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True


def user_totals_tws(
    sdf: DataFrame,
    key_col: str,
    cents_col: str,
) -> DataFrame:
    """Per-key running (event count, cents total) via the Spark 4
    ``transformWithStateInPandas`` StatefulProcessor API — the successor to
    ``applyInPandasWithState`` (typed value state, TTL support, composite
    state vars). Semantics mirror st6's ``running_totals`` closure exactly:
    update-mode snapshots per key per micro-batch, state carried across
    batches, so the batch aggregate is the convergence oracle.

    Raises RuntimeError when the runtime lacks protobuf — callers gate on
    :func:`transform_with_state_supported` (see queryset_nstar st10).

    Scale: state is one (bigint, bigint) row per key in the state store
    (RocksDB provider on real clusters); each micro-batch shuffles only the
    keys it touched — identical movement profile to applyInPandasWithState.
    """
    if not transform_with_state_supported():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python environment — probe transform_with_state_supported() "
            "before calling")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (self._totals.get() or (0, 0)) \
                if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf[cents_col].sum())
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "cents": [cents]})

        def close(self) -> None:
            pass

    return sdf.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
