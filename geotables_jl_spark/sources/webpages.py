"""Common-Crawl-style web-page source (the north-star input shape).

``BASELINE.json.input_hint`` fixes the input table to
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module provides:

- ``webpages_from_documents``: derive that exact shape deterministically
  from the driver's ``documents.parquet`` testdata (no external data, no
  RNG — every derived value is a pure column expression over ``doc_id`` /
  ``text``, so the same rows come out at any parallelism level and the
  ``text`` column passes through **byte-identical**, the per-row invariant
  the north star checks).
- ``extract_geotags``: the text→(lat, lon) extraction front-end — a JVM
  ``regexp_extract`` over the page text (no Python in the hot path),
  feeding ``georef`` exactly like the reference's coordinate-column
  constructor (``/root/reference/src/georef.jl:81-105``).
- ``geotagged_webpages``: the composition, returning a GeoTable of pages.

Scale notes: everything is narrow (no shuffle, no UDF); at 100 TB this is
a map-only stage fused into the parquet/Iceberg scan by whole-stage
codegen, and the geotag regex prunes to the two extracted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef

#: geotag marker embedded in page text: "geo:<decimilli-lat>,<decimilli-lon>"
#: integers (1e-4 degree units) — integer→string round-trips are
#: byte-identical across engines, float→string formatting is not.
GEO_RE = r"geo:(-?\d+),(-?\d+)"


def webpages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (url, warc_ts, html, text, lang) web pages.

    Derivations (all exact integer column math, reproducible in ANSI SQL):
    - url      = https://site<doc_id mod 97>.example.com/<source>/<doc_id>
    - warc_ts  = 2024-01-01 00:00:00 UTC + (doc_id * 9973 mod 31536000) s
    - text     = original text ++ " geo:<ilat>,<ilon>" marker where
                 ilat = (doc_id*7919 mod 1700)*1000 + 500 - 850000    (1e-4 deg)
                 ilon = (doc_id*104729 mod 3600)*1000 + 500 - 1800000 (1e-4 deg)
                 (the +500 offset keeps every page strictly off 10-degree
                 tile boundaries — no edge-case double-counting in tiling)
    - html     = "<html><body>" ++ text ++ "</body></html>" as binary
    - lang     = passthrough
    """
    doc = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    # fixture parquets are single-row-group files (one input split); a
    # real corpus has thousands of splits — normalize so downstream
    # per-row work parallelizes (deterministic: hash on the key).
    doc = doc.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return webpages_from_df(doc)


def webpages_from_df(doc: DataFrame) -> DataFrame:
    """Same derivation over any (doc_id, text, lang, source) DataFrame —
    used by the scaling bench to amplify the corpus deterministically
    (replicated doc_ids get distinct urls/coords/timestamps)."""
    did = F.col("doc_id")
    ilat = ((did * F.lit(7919)) % F.lit(1700)) * F.lit(1000) + F.lit(500) - F.lit(850000)
    ilon = ((did * F.lit(104729)) % F.lit(3600)) * F.lit(1000) + F.lit(500) - F.lit(1800000)
    text = F.concat(
        F.col("text"),
        F.lit(" geo:"),
        ilat.cast("string"),
        F.lit(","),
        ilon.cast("string"),
    )
    url = F.concat(
        F.lit("https://site"),
        (did % F.lit(97)).cast("string"),
        F.lit(".example.com/"),
        F.col("source"),
        F.lit("/"),
        did.cast("string"),
    )
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + (did * F.lit(9973)) % F.lit(31536000)
    )
    html = F.encode(
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8"
    )
    return doc.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.col("lang").alias("lang"),
        did.alias("row_id"),  # natural key → stable row identity, no window
    )


def extract_geotags(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract (lat, lon) from the page text geotag marker.

    Pure JVM ``regexp_extract``; pages without a marker get NULL coords
    (dropped by ``geotagged_webpages``). ``text`` is untouched —
    byte-identical passthrough.
    """
    t = F.col(text_col)
    ilat = F.regexp_extract(t, GEO_RE, 1)
    ilon = F.regexp_extract(t, GEO_RE, 2)
    return pages.withColumn(
        "lat", F.when(ilat != "", ilat.cast("long") / F.lit(10000.0))
    ).withColumn("lon", F.when(ilon != "", ilon.cast("long") / F.lit(10000.0)))


def canonical_url(url: Column) -> Column:
    """Canonical form of a crawl URL: scheme stripped, query/fragment
    dropped, host lowercased with a leading ``www.`` removed, trailing
    slash trimmed. Pure JVM regexp (map-only at any scale); every step
    is ANSI-replicable (identical patterns run in DuckDB's RE2)."""
    u = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    u = F.regexp_replace(u, r"[#?].*$", "")
    host = F.regexp_replace(F.lower(F.regexp_extract(u, r"^([^/]*)", 1)), r"^www\.", "")
    path = F.regexp_replace(F.regexp_replace(u, r"^[^/]*", ""), r"/$", "")
    return F.concat(host, path)


def url_host(url: Column) -> Column:
    """Canonical host of a crawl URL (see :func:`canonical_url`)."""
    u = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    return F.regexp_replace(F.lower(F.regexp_extract(u, r"^([^/]*)", 1)), r"^www\.", "")


def latest_snapshot_per_key(
    pages: DataFrame, key: Column, ts_col: str = "warc_ts", id_col: str = "row_id"
) -> DataFrame:
    """Crawl-snapshot dedup: one row per key — the LATEST capture
    (max ``ts_col``, ties broken by min ``id_col``) plus the capture
    count. ONE map-side-combinable groupBy (max over a lexicographic
    struct — no window, no self-join): the 100 TB shape for
    keep-newest-per-url/host dedup over rolling crawl dumps."""
    m = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            (-F.col(id_col)).alias("nid"),
        )
    ).alias("m")
    out = pages.groupBy(key.alias("key")).agg(m, F.count(F.lit(1)).alias("n_captures"))
    return out.select(
        "key",
        F.col("m.ts").alias("latest_ts"),
        (-F.col("m.nid")).alias("latest_id"),
        "n_captures",
    )


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text_extracted") -> DataFrame:
    """html binary → extracted text, deterministically.

    UTF-8 decode + tag strip as compiled JVM expressions — no Python, no
    allocation beyond the output string; identical bytes at any
    parallelism level (the north star's per-row invariant: byte-identical
    extracted text per url). Real-world HTML needs entity decoding and
    script/style elision — the tag-strip stays the cheap JVM prefilter
    and those become Arrow-batched kernels over the residue."""
    raw = F.decode(F.col(html_col), "UTF-8")
    return pages.withColumn(out_col, F.regexp_replace(raw, r"<[^>]+>", ""))


def geotagged_webpages(spark: SparkSession, sf_dir: str) -> GeoTable:
    """The north-star construction: web pages → geotag extraction →
    ``georef`` on the (lat, lon) columns (CRS heuristic picks LatLon,
    mirroring ``/root/reference/src/georef.jl:137-157``)."""
    pages = extract_geotags(webpages_from_documents(spark, sf_dir))
    pages = pages.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return georef(pages, coords=["lat", "lon"])
