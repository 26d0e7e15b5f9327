"""Snapshot checkpoint/resume: commit, resume-hit, fingerprint
invalidation, torn-manifest recovery, per-partition lineage metrics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from geotables_jl_spark.plans.checkpoint import LINEAGE_COL, Checkpointer


def _build_counter(spark, calls):
    def build():
        calls.append(1)
        return spark.range(1000).withColumn("v", F.col("id") * 2).repartition(4)

    return build


def test_commit_and_resume(spark, tmp_path):
    cp = Checkpointer(spark, str(tmp_path), run_id="r1")
    calls: list[int] = []
    out1 = cp.stage("s1", "fp-a", _build_counter(spark, calls))
    assert out1.count() == 1000 and len(calls) == 1

    # same fingerprint → snapshot read, no recompute
    out2 = cp.stage("s1", "fp-a", _build_counter(spark, calls))
    assert out2.count() == 1000 and len(calls) == 1

    # changed fingerprint → recompute + new commit
    out3 = cp.stage("s1", "fp-b", _build_counter(spark, calls))
    assert out3.count() == 1000 and len(calls) == 2


def test_manifest_lineage_and_metrics(spark, tmp_path):
    cp = Checkpointer(spark, str(tmp_path), run_id="r2")
    calls: list[int] = []
    out = cp.stage("s1", "fp", _build_counter(spark, calls))
    assert LINEAGE_COL in out.columns

    m = cp.manifest("s1")
    assert m["rows"] == 1000
    assert sum(m["partition_rows"].values()) == 1000
    assert m["partitions"] >= 1

    metrics = [json.loads(l) for l in open(os.path.join(cp.root, "metrics.jsonl"))]
    assert metrics[-1]["event"] == "commit" and metrics[-1]["rows"] == 1000

    cp.stage("s1", "fp", _build_counter(spark, calls))
    metrics = [json.loads(l) for l in open(os.path.join(cp.root, "metrics.jsonl"))]
    assert metrics[-1]["event"] == "resume_hit" and len(calls) == 1


def test_torn_manifest_recomputes(spark, tmp_path):
    cp = Checkpointer(spark, str(tmp_path), run_id="r3")
    calls: list[int] = []
    cp.stage("s1", "fp", _build_counter(spark, calls))
    # simulate a crash mid-commit: corrupt the manifest
    with open(cp._manifest_path("s1"), "w") as f:
        f.write("{not json")
    out = cp.stage("s1", "fp", _build_counter(spark, calls))
    assert out.count() == 1000 and len(calls) == 2
