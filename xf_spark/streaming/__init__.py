from xf_spark.streaming.ingest import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    conversation_turn_totals,
    current_index_path,
    prune_versions,
    stream_index,
    stream_to_iceberg,
    transcript_stream,
    turns_per_window,
)
