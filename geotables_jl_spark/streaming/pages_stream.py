"""Structured Streaming over web-page arrivals (WARC-style micro-batches).

The reference is batch-only (SURVEY §2.9) — streaming is this engine's
extension for continuously-arriving crawl data. The flagship geojoin is
streamable because its physical plan is a *stream-static* join: the
static tile/cell side broadcasts, page points cover exactly one cell
(no dedupe stage), and box refinement is a pure column predicate — so
the whole pipeline stays inside Structured Streaming's supported
operator set (no stream-stream join, no iterative stage):

    pages stream → geotag extract (map) → cell id (map)
      → broadcast join with static tile covers → bbox refine (filter)
      → watermarked window × tile groupBy count

State is bounded by the watermark; at 100 TB/day scale the shuffle key
is (window, tile) — ~648 tiles × windows, tiny state per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GeoTable
from geotables_jl_spark.sources.webpages import extract_geotags

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_page_stream(spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8) -> DataFrame:
    """File-arrival stream of pages (parquet drops into ``source_dir``).

    In production this is the Iceberg/Kafka ingest edge; the parquet
    file source has identical semantics (each new file = one batch of
    arrivals, exactly-once per checkpoint)."""
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_tile_counts(
    pages: DataFrame,
    tiles: GeoTable,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-window page counts per tile — the streaming form
    of the flagship tile geojoin.

    ``tiles`` is the static side; its envelope is turned into pure
    column bounds so the join is a broadcast range predicate on the
    page's point (streamable; no shuffle on the static side)."""
    tagged = extract_geotags(pages).filter(
        F.col("lat").isNotNull() & F.col("lon").isNotNull()
    )
    t = tiles.df.select(
        F.col("tile_id"),
        F.col("geometry")["xmin"].alias("__x0"),
        F.col("geometry")["ymin"].alias("__y0"),
        F.col("geometry")["xmax"].alias("__x1"),
        F.col("geometry")["ymax"].alias("__y1"),
    )
    joined = tagged.withWatermark("warc_ts", watermark).join(
        F.broadcast(t),
        (F.col("lon") >= F.col("__x0"))
        & (F.col("lon") < F.col("__x1"))
        & (F.col("lat") >= F.col("__y0"))
        & (F.col("lat") < F.col("__y1")),
        "inner",
    )
    return (
        joined.groupBy(F.window("warc_ts", window).alias("win"), F.col("tile_id"))
        .agg(F.count(F.lit(1)).alias("n_pages"), F.min("url").alias("min_url"))
        .select(
            F.col("win.start").alias("window_start"),
            "tile_id",
            "n_pages",
            "min_url",
        )
    )


def stream_dedup_urls(pages: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: first arrival per url wins; duplicate
    arrivals within the watermark horizon are dropped. State is bounded
    by the watermark (url → seen, expired as event time advances)."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_pages", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stream_host_sessions(
    pages: DataFrame,
    gap_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): crawl
    sessionization per host — consecutive page arrivals from one host
    with inter-arrival gaps ≤ ``gap_seconds`` form one session; a
    session closes (and is emitted) when the event-time watermark passes
    its end + gap. Arbitrary gap-based sessions are NOT expressible with
    fixed windows — this is the canonical use of the user-state API.

    State per host: (start, end, count) — O(1) per key, expired by the
    event-time timeout, so total state is bounded by the number of
    hosts active inside the watermark horizon.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_pages": [n],
                }
            )
            return
        lo, hi, cnt = None, None, 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["warc_ts"]).astype("int64") // 1000  # µs
            lo = int(ts.min()) if lo is None else min(lo, int(ts.min()))
            hi = int(ts.max()) if hi is None else max(hi, int(ts.max()))
            cnt += len(ts)
        if cnt == 0:
            return
        if state.exists:
            s0, e0, n0 = state.get
            # gap exceeded between stored session and this burst: emit the
            # old session, start fresh (late/out-of-order bursts inside the
            # watermark merge instead)
            if lo - e0 > gap_us:
                state.update((lo, hi, cnt))
                closed = pd.DataFrame(
                    {
                        "host": [key[0]],
                        "session_start": [pd.Timestamp(s0, unit="us")],
                        "session_end": [pd.Timestamp(e0, unit="us")],
                        "n_pages": [n0],
                    }
                )
                state.setTimeoutTimestamp(hi // 1000 + gap_seconds * 1000)
                yield closed
                return
            state.update((min(s0, lo), max(e0, hi), n0 + cnt))
            state.setTimeoutTimestamp(max(e0, hi) // 1000 + gap_seconds * 1000)
        else:
            state.update((lo, hi, cnt))
            state.setTimeoutTimestamp(hi // 1000 + gap_seconds * 1000)

    # same host key as the batch-side canonicalization (www-stripped,
    # lowercased, path-less URLs included — the old regexp required a
    # trailing slash, sessionizing every bare-host URL under '')
    from geotables_jl_spark.sources.webpages import url_host

    hosts = pages.withColumn("host", url_host(F.col("url"))).withWatermark(
        "warc_ts", watermark
    )
    return hosts.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
