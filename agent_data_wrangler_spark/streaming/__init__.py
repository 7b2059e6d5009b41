"""Structured Streaming tier (SURVEY §2.7): streaming ingestion, watermarked
windowed aggregation, in-stream dedup, sessionization."""

from agent_data_wrangler_spark.streaming.ops import (
    dedup_within_watermark,
    enrich_static,
    run_foreach_batch,
    run_available_now,
    session_agg,
    sessionize_stateful,
    stream_from_directory,
    stream_interval_join,
    stream_interval_join_outer,
    transform_with_state_supported,
    user_totals_tws,
    windowed_agg,
)

__all__ = [
    "dedup_within_watermark",
    "enrich_static",
    "run_available_now",
    "run_foreach_batch",
    "session_agg",
    "sessionize_stateful",
    "stream_from_directory",
    "stream_interval_join",
    "stream_interval_join_outer",
    "transform_with_state_supported",
    "user_totals_tws",
    "windowed_agg",
]
