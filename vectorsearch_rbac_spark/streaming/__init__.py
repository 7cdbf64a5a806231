from .pipelines import (
    BLOCK_SCHEMA,
    EVENT_SCHEMA,
    stream_events_from_dir,
    windowed_event_counts,
    run_bounded_to_memory,
    hourly_stats_stream,
    streaming_dedup,
    streaming_sessionize,
    stateful_user_stats,
    streaming_block_insertion,
    streaming_corpus_filter,
    stream_stream_view_purchase_join,
)

__all__ = [
    "BLOCK_SCHEMA",
    "EVENT_SCHEMA",
    "stream_events_from_dir",
    "windowed_event_counts",
    "run_bounded_to_memory",
    "hourly_stats_stream",
    "streaming_dedup",
    "streaming_sessionize",
    "stateful_user_stats",
    "streaming_block_insertion",
    "streaming_corpus_filter",
    "stream_stream_view_purchase_join",
]
