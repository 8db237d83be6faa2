from preql_spark.streaming.stream import (
    read_event_stream, tumbling_agg, sliding_agg, session_agg,
    run_to_memory, stream_dedup, stream_join, stream_to_parquet,
    incremental_rollup, stateful_counter, incremental_dedup_ingest,
)

__all__ = ["read_event_stream", "tumbling_agg", "sliding_agg",
           "session_agg", "run_to_memory", "stream_dedup", "stream_join",
           "stream_to_parquet", "incremental_rollup", "stateful_counter",
           "incremental_dedup_ingest"]
