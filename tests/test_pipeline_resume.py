"""End-to-end resumable geotag pipeline: fingerprint-chained stages,
suffix-only recompute on parameter change, snapshot reuse across runs,
and correctness of the final tile rollup vs a direct computation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from geotables_jl_spark.plans.pipeline import geotag_pipeline

SF = "/root/testdata/sf0.001"


def _events(root: str, run_id: str) -> list[dict]:
    path = os.path.join(root, run_id, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_pipeline_commits_then_resumes(spark, tmp_path):
    root = str(tmp_path)
    out1 = geotag_pipeline(spark, root, SF, run_id="p1")
    ev = _events(root, "p1")
    assert [e["event"] for e in ev] == ["commit"] * 4
    assert [e["stage"] for e in ev] == ["extract", "dedup", "stats", "tiles"]
    n_tiles = out1["tiles"].count()
    assert n_tiles > 0

    # fresh pipeline object, same params → every stage resumes from its
    # snapshot, nothing recomputes
    out2 = geotag_pipeline(spark, root, SF, run_id="p1")
    ev = _events(root, "p1")
    assert [e["event"] for e in ev[4:]] == ["resume_hit"] * 4
    assert out2["tiles"].count() == n_tiles


def test_param_change_recomputes_only_downstream(spark, tmp_path):
    root = str(tmp_path)
    geotag_pipeline(spark, root, SF, run_id="p2")
    # stage-3 parameter change → extract/dedup resume, stats/tiles recompute
    geotag_pipeline(spark, root, SF, run_id="p2", min_quality=-1e9)
    ev = _events(root, "p2")
    tail = {(e["stage"], e["event"]) for e in ev[4:]}
    assert tail == {
        ("extract", "resume_hit"),
        ("dedup", "resume_hit"),
        ("stats", "commit"),
        ("tiles", "commit"),
    }


def test_tile_rollup_matches_direct(spark, tmp_path):
    """The checkpointed flow must equal the same plan run unchunked."""
    out = geotag_pipeline(spark, str(tmp_path), SF, run_id="p3")
    got = {r["tile_id"]: (r["n_pages"], r["sum_tokens"]) for r in out["tiles"].collect()}

    from geotables_jl_spark.functions import textstats as T
    from geotables_jl_spark.operators.dedup import dedup_exact
    from geotables_jl_spark.sources.webpages import extract_geotags, webpages_from_documents

    pages = extract_geotags(webpages_from_documents(spark, SF))
    pages = pages.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    pages = dedup_exact(pages, "row_id", "text")
    direct = (
        pages.select(
            (
                F.floor((F.col("lat") + 90.0) / 10.0).cast("long") * 36
                + F.floor((F.col("lon") + 180.0) / 10.0).cast("long")
            ).alias("tile_id"),
            T.token_count(F.col("text")).alias("n_tokens"),
        )
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("n_tokens").alias("sum_tokens"))
    )
    want = {r["tile_id"]: (r["n_pages"], r["sum_tokens"]) for r in direct.collect()}
    assert got == want


def test_per_partition_lineage_in_snapshots(spark, tmp_path):
    root = str(tmp_path)
    geotag_pipeline(spark, root, SF, run_id="p4")
    from geotables_jl_spark.plans.checkpoint import LINEAGE_COL, Checkpointer

    cp = Checkpointer(spark, root, run_id="p4")
    for stage in ("extract", "dedup", "stats", "tiles"):
        m = cp.manifest(stage)
        assert m is not None and m["rows"] == sum(m["partition_rows"].values())
        snap = spark.read.parquet(os.path.join(root, "p4", stage, "data"))
        assert LINEAGE_COL in snap.columns
