from kafka_merge_purge_spark.streaming.pipeline import (  # noqa: F401
    drain_events_stream,
    stream_records_from_dir,
)
from kafka_merge_purge_spark.streaming.sink import exactly_once_parquet_sink  # noqa: F401
