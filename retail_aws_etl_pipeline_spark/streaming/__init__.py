from retail_aws_etl_pipeline_spark.streaming.streams import (  # noqa: F401
    events_stream,
    hourly_rollup_stream,
    dedup_stream,
    session_stream,
    running_user_stats_stream,
    run_pipeline_available_now,
    run_stream_to_memory,
)
