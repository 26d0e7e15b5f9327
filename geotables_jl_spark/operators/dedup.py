"""Deduplication operators for web-scale corpora.

Five families, each with a distinct scale profile:

- ``dedup_exact``: hash-groupBy on content (or its rolling-hash
  fingerprint) — one shuffle, map-side combinable.
- ``ngram_jaccard_pairs``: exact near-dup pairs via an inverted shingle
  index (explode → equi-join on shingle → pair counts → Jaccard). The
  classic posting-list self-join; frequent-shingle pruning bounds the
  quadratic blowup at scale.
- ``minhash_lsh_pairs``: MinHash signatures (xxhash64 family, seeded —
  deterministic across runs/parallelism) → banded LSH buckets →
  candidate pairs → exact Jaccard verification. The 100 TB path: cost is
  O(docs × perms) + bucket joins, never all-pairs.
- ``simhash_pairs``: 64-bit SimHash per doc (JVM bit math over shingle
  hashes), chunk-banded candidates (pigeonhole on 4×16-bit chunks),
  verified by ``bit_count(xor) <= k`` — all JVM, zero Python.
- ``embedding_neardup_pairs``: cosine ≥ t pairs over an embedding
  column; brute-force block join at small n, sign-LSH bucketed at scale.

All pair outputs are canonicalized ``id_a < id_b`` and deduplicated.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geotables_jl_spark.functions.textstats import fingerprint, shingles


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct content: keeper id (min id), duplicate count,
    and the rolling-hash fingerprint. groupBy on the text itself is exact;
    at 100 TB group on ``fingerprint`` first and only compare full text
    within colliding groups (collision rate ~n²/2p, negligible)."""
    return (
        df.groupBy(text_col)
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .withColumn("fp", fingerprint(F.col(text_col)))
        .select("keeper_id", "dup_count", "fp")
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct content — the filtered corpus."""
    keepers = df.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    return df.join(keepers, on=[text_col, id_col], how="left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup)
# ---------------------------------------------------------------------------


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"), F.explode(shingles(F.col(text_col), n)).alias("__sh")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted shingle index.

    Plan: explode distinct shingles → (optional) drop shingles whose
    posting list exceeds ``max_posting`` (stopword-like shingles explode
    quadratically and contribute little discrimination) → self-equi-join
    on shingle → count shared per pair → join per-doc totals →
    ``jaccard = shared / (|A| + |B| - shared)`` — exact rational math.
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    if max_posting is not None:
        hot = sh.groupBy("__sh").count().filter(F.col("count") > max_posting).select("__sh")
        sh = sh.join(F.broadcast(hot), on="__sh", how="left_anti")
    counts = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))

    a = sh.select(F.col("__id").alias("id_a"), "__sh")
    b = sh.select(F.col("__id").alias("id_b"), "__sh")
    shared = (
        a.join(b, on="__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    na = counts.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = counts.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    out = (
        shared.join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("__shared").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__shared")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column, num_perm: int = 64, shingle_n: int = 3) -> Column:
    """array<long> MinHash signature: perm i = min over shingles of
    xxhash64(shingle, i). Deterministic (seeded hash family), pure JVM."""
    sh = shingles(text, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    verify: bool = True,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs by MinHash + banded LSH, exact-Jaccard verified.

    bands × rows = num_perm; a pair lands in a bucket iff one band of
    their signatures agrees — P(candidate) = 1-(1-j^r)^b (≈ .9998 at
    j=0.8 with 16×4). Buckets are (band_id, hash(band slice)) groups →
    pairs within buckets (sorted collect, pairwise explode — bucket size
    is bounded because identical band-slices imply near-identical docs;
    truly giant buckets are exact-dup classes, which exact dedup removes
    first at scale). ``verify`` recomputes exact shingle Jaccard on the
    candidates only.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        minhash_signature(F.col(text_col), num_perm, shingle_n).alias("__sig"),
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice(F.col("__sig"), b * rows + 1, rows))).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("__bb"),
    ).select("__id", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))

    members = banded.groupBy("__band", "__bucket").agg(
        F.array_sort(F.collect_set("__id")).alias("__ids")
    ).filter(F.size("__ids") > 1)
    # pairwise explode within bucket: (i, j) i<j
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("__p")
    ).select("__p.id_a", "__p.id_b").distinct()

    if not verify:
        return pairs
    texts = df.select(F.col(id_col).alias("__vid"), shingles(F.col(text_col), shingle_n).alias("__sh"))
    ta = texts.select(F.col("__vid").alias("id_a"), F.col("__sh").alias("__sha"))
    tb = texts.select(F.col("__vid").alias("id_b"), F.col("__sh").alias("__shb"))
    out = (
        pairs.join(ta, on="id_a")
        .join(tb, on="id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sha", "__shb")).cast("double")
            / F.size(F.array_union("__sha", "__shb")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash as a long — JVM bit math, no Python.

    For each bit b: sign(sum over shingles of ±1 by bit b of the shingle
    hash). Implemented as one fold per bit over the shingle-hash array
    (64 folds of a small array — codegen'd, still cheaper than moving
    text to Python)."""
    hashes = F.transform(shingles(text, shingle_n), lambda s: F.xxhash64(s))
    def bit_vote(b: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b if b < 63 else -(1 << 63))) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(bit_vote(b))
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    shingle_n: int = 2,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Banding by pigeonhole: split the 64-bit hash into ``max_hamming + 1``
    chunks; any pair within the distance budget agrees exactly on at
    least one chunk → equi-join per chunk, verify with bit_count(xor).
    Output: (id_a, id_b, hamming).
    """
    nchunks = max_hamming + 1
    width = 64 // nchunks
    sig = df.select(F.col(id_col).alias("__id"), simhash(F.col(text_col), shingle_n).alias("__sim"))
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("__sim"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for c in range(nchunks)
        ]
    )
    chunks = sig.select(
        "__id", "__sim", F.explode(chunk_structs).alias("__c")
    ).select("__id", "__sim", F.col("__c.chunk").alias("__chunk"), F.col("__c.key").alias("__key"))
    a = chunks.select(F.col("__id").alias("id_a"), F.col("__sim").alias("__sa"), "__chunk", "__key")
    b = chunks.select(F.col("__id").alias("id_b"), F.col("__sim").alias("__sb"), "__chunk", "__key")
    cand = (
        a.join(b, on=["__chunk", "__key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    use_lsh: bool = False,
    planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    Brute-force path: self-join (id_a < id_b) with the JVM dot product —
    O(n²) but shuffle-free per pair; correct baseline for tests. Scale
    path (``use_lsh``): sign-LSH bucket join — each vector hashed by the
    signs of ``planes`` seeded random hyperplanes; only same-bucket pairs
    are scored (recall < 1 by design; raise ``planes`` bands at scale).
    """
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")).withColumn(
        "__n", _norm(F.col("__v"))
    )
    if use_lsh:
        import numpy as np

        dim = len(df.select(vec_col).first()[0])
        rng = np.random.default_rng(seed)
        H = rng.standard_normal((planes, dim))
        def bucket(v: Column) -> Column:
            bits = F.lit(0).cast("long")
            for p in range(planes):
                d = F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(c)) for c in H[p]]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                bits = bits.bitwiseOR(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
            return bits

        base = base.withColumn("__bkt", bucket(F.col("__v")))
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__nna"), "__bkt")
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nnb"), "__bkt")
        cand = a.join(b, on="__bkt").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__nna"))
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nnb"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn(
            "cosine", _dot(F.col("__va"), F.col("__vb")) / (F.col("__nna") * F.col("__nnb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
