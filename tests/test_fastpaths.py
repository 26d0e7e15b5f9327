"""Regression tests for the vectorized fast paths: Arrow fingerprint
parity, blocked-cosine vs naive pairs, and multi-round kNN ring
expansion (the certification loop, not just the radius-1 happy path)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef
from geotables_jl_spark.functions.textstats import FP_BASE, FP_MOD, fingerprint, fingerprint_fast
from geotables_jl_spark.operators.dedup import embedding_neardup_pairs
from geotables_jl_spark.operators.geojoin import knn_join


def _py_fp(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * FP_BASE + ord(c)) % FP_MOD
    return acc


def test_fingerprint_fast_matches_sql_and_python(spark):
    # includes non-BMP (surrogate-pair) input: emoji, math alphanumerics —
    # Spark's split('')+ascii folds CODEPOINTS, as does the utf-32 fast path
    texts = ["", "a", "hello world", "x" * 700, "Üñíçødé text", "tab\tand\nnewline",
             "emoji 😀 test", "𝕏 math 🎉🎉", "mixed 漢字 and 😺"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    rows = df.select(
        "id", fingerprint(F.col("t")).alias("sql_fp"), fingerprint_fast(F.col("t")).alias("fast_fp")
    ).collect()
    for r in rows:
        assert r["sql_fp"] == r["fast_fp"] == _py_fp(texts[r["id"]])


def test_blocked_cosine_matches_naive(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)], "vid long, v array<double>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(df, "vid", "v", threshold=0.3).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    want = {
        (i, j): round(float(cos[i, j]), 6)
        for i in range(60)
        for j in range(i + 1, 60)
        if cos[i, j] >= 0.3
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_knn_multi_round_expansion(spark):
    # sparse points + tiny forced cell_size → radius must double several
    # times before the k-th neighbor is certified; exact result must
    # equal brute force regardless of how many rounds it takes
    pts = [(i, float(i * i % 97), float((i * 37) % 89)) for i in range(40)]
    df = spark.createDataFrame(pts, "row_id long, x double, y double")
    gtb = georef(df, coords=["x", "y"], crs="Cartesian")
    out = knn_join(gtb, gtb, k=4, cell_size=0.5)  # ~1 point per 2000 cells
    got = {}
    for r in out.collect():
        got.setdefault(r["row_id"], []).append((r["rank"], r["neighbor_id"], r["distance"]))
    assert set(got) == {p[0] for p in pts}
    for qid, qx, qy in pts:
        d = sorted((math.hypot(px - qx, py - qy), pid) for pid, px, py in pts)[:4]
        mine = sorted(got[qid])
        assert len(mine) == 4
        for rank, (dist, pid) in enumerate(d, 1):
            assert mine[rank - 1][1] == pid
            assert mine[rank - 1][2] == pytest.approx(dist, abs=1e-9)


def test_extract_text_byte_identical_across_parallelism(spark):
    # north-star per-row invariant: text extracted from html is
    # byte-identical to the text column per url, at any partitioning
    from geotables_jl_spark.sources.webpages import extract_text, webpages_from_documents

    pages = webpages_from_documents(spark, "/root/testdata/sf0.001")
    for parts in (2, 16):
        out = extract_text(pages.repartition(parts))
        bad = out.filter(F.col("text_extracted") != F.col("text")).count()
        assert bad == 0
        rows = {r["url"]: r["text_extracted"] for r in out.select("url", "text_extracted").collect()}
        if parts == 2:
            first = rows
        else:
            assert rows == first
