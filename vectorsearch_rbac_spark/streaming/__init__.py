from .pipelines import (
    BLOCK_SCHEMA,
    EVENT_SCHEMA,
    stream_events_from_dir,
    windowed_event_counts,
    streaming_dedup,
    streaming_sessionize,
    stateful_user_stats,
    streaming_block_insertion,
    streaming_corpus_filter,
)

__all__ = [
    "BLOCK_SCHEMA",
    "EVENT_SCHEMA",
    "stream_events_from_dir",
    "windowed_event_counts",
    "streaming_dedup",
    "streaming_sessionize",
    "stateful_user_stats",
    "streaming_block_insertion",
    "streaming_corpus_filter",
]
