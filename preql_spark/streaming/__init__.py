from preql_spark.streaming.stream import (
    read_event_stream, tumbling_agg, sliding_agg, session_agg,
    run_to_memory, stream_dedup, stream_join, stream_to_parquet,
    incremental_rollup, stateful_counter, incremental_dedup_ingest,
    incremental_neardup_ingest, incremental_postings_ingest,
    incremental_ivf_ingest,
    incremental_frequent_items_ingest, incremental_quantile_ingest,
    incremental_distinct_ingest, incremental_hll_ingest,
    incremental_tdigest_ingest, incremental_psi_ingest,
    incremental_ks_ingest, incremental_chi_square_ingest,
    compact_ingest_state, compact_ingest_ids,
)

__all__ = ["read_event_stream", "tumbling_agg", "sliding_agg",
           "session_agg", "run_to_memory", "stream_dedup", "stream_join",
           "stream_to_parquet", "incremental_rollup", "stateful_counter",
           "incremental_dedup_ingest", "incremental_neardup_ingest",
           "incremental_postings_ingest", "incremental_ivf_ingest",
           "incremental_frequent_items_ingest",
           "incremental_quantile_ingest", "incremental_distinct_ingest",
           "incremental_hll_ingest", "incremental_tdigest_ingest",
           "incremental_psi_ingest", "incremental_ks_ingest",
           "incremental_chi_square_ingest",
           "compact_ingest_state", "compact_ingest_ids"]
