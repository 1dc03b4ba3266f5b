from bigdatalab_spark.streaming.jobs import (
    kafka_stream,
    processing_time_window_counts,
    run_stream_to_memory,
    socket_stream,
    stream_events,
    unique_sink_name,
    windowed_counts,
)

__all__ = [
    "kafka_stream",
    "processing_time_window_counts",
    "run_stream_to_memory",
    "socket_stream",
    "stream_events",
    "unique_sink_name",
    "windowed_counts",
]
