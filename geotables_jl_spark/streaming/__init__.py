from geotables_jl_spark.streaming.pages_stream import (
    PAGE_SCHEMA,
    read_page_stream,
    stream_dedup_urls,
    stream_host_sessions,
    stream_tile_counts,
)

__all__ = [
    "PAGE_SCHEMA",
    "read_page_stream",
    "stream_tile_counts",
    "stream_dedup_urls",
    "stream_host_sessions",
]
