"""Structured Streaming: windowed tile rollups + streaming dedup match
their batch equivalents once all files are processed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef_grid
from geotables_jl_spark.sources.webpages import webpages_from_documents
from geotables_jl_spark.streaming import (
    read_page_stream,
    stream_dedup_urls,
    stream_tile_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def page_dir(spark, tmp_path_factory):
    """Pages split into 3 parquet files (3 arrival batches)."""
    d = str(tmp_path_factory.mktemp("pages"))
    pages = webpages_from_documents(spark, SF).select("url", "warc_ts", "html", "text", "lang")
    for i in range(3):
        pages.filter(F.crc32(F.col("url")) % 3 == i).coalesce(1).write.mode("append").parquet(d)
    return d


def _tiles(spark):
    g = georef_grid(spark, 36, 18, ox=-180.0, oy=-90.0, sx=10.0, sy=10.0)
    return GeoTable(
        df=g.df.select("row_id", F.col("row_id").alias("tile_id"), "geometry"),
        crs="LatLon",
        grid=g.grid,
    )


def test_stream_tile_counts_matches_batch(spark, page_dir, tmp_path):
    stream = read_page_stream(spark, page_dir, max_files_per_trigger=1)
    out = stream_tile_counts(stream, _tiles(spark), window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["tile_id"]): (r["n_pages"], r["min_url"])
        for r in spark.sql("select * from tile_counts").collect()
    }

    # batch equivalent over the same files (append mode only emits
    # windows closed by the watermark; compare on the emitted subset)
    batch = spark.read.parquet(page_dir)
    exp_df = stream_tile_counts(batch, _tiles(spark), window="1 hour")
    exp = {
        (r["window_start"], r["tile_id"]): (r["n_pages"], r["min_url"])
        for r in exp_df.collect()
    }
    assert got, "stream emitted nothing"
    for key, val in got.items():
        assert exp[key] == val
    # watermark holdback: everything except the tail of event time emits
    assert len(got) >= len(exp) * 0.5


def test_stream_dedup_urls(spark, page_dir, tmp_path):
    # duplicate every file's rows by reading the dir twice into a union view
    stream = read_page_stream(spark, page_dir, max_files_per_trigger=2)
    q = (
        stream_dedup_urls(stream, watermark="2 hours")
        .select("url")
        .writeStream.format("memory")
        .queryName("dedup_urls")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r["url"] for r in spark.sql("select url from dedup_urls").collect()]
    n_urls = spark.read.parquet(page_dir).select("url").distinct().count()
    assert len(got) == len(set(got)) == n_urls


def test_stream_host_sessions(spark, tmp_path):
    """Custom stateful sessionization (applyInPandasWithState): gap-split
    sessions per host match a hand-computed expectation."""
    import datetime as dt

    from geotables_jl_spark.streaming import stream_host_sessions

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(host, minutes):
        return (
            f"https://{host}/p{minutes}",
            t0 + dt.timedelta(minutes=minutes),
            None,
            "x",
            "en",
        )

    # host a: two sessions (gap 30 min > 10 min); host b: one session
    batch1 = [row("a.com", 0), row("a.com", 5), row("b.com", 2)]
    batch2 = [row("a.com", 40), row("a.com", 44)]
    # a late sentinel far ahead advances the watermark so sessions close
    batch3 = [row("z.com", 600)]
    d = str(tmp_path / "sessions_in")
    import os

    os.makedirs(d, exist_ok=True)
    for i, batch in enumerate([batch1, batch2, batch3]):
        spark.createDataFrame(
            batch, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("append").parquet(d)

    from geotables_jl_spark.streaming import read_page_stream

    stream = read_page_stream(spark, d, max_files_per_trigger=1)
    out = stream_host_sessions(stream, gap_seconds=600, watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("host_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sessions"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["host"], r["session_start"].minute, r["session_end"].minute, r["n_pages"])
        for r in spark.sql("select * from host_sessions").collect()
    }
    assert ("a.com", 0, 5, 2) in got
    assert ("a.com", 40, 44, 2) in got
    assert ("b.com", 2, 2, 1) in got
