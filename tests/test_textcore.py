"""Parity tests: text_core_arrow's integer components must reproduce the
HOF/regexp column twins bit-for-bit, including the token_count quirks
(SQL trim strips SPACES only, boundary empties from non-space whitespace
prefixes count) — and the rebuilt ratio/quality/lang_id codegen tails
must equal the original whole-column expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from geotables_jl_spark.functions import textstats as TS

ADVERSARIAL = [
    "",
    " ",
    "\t",  # trim keeps it; split -> ['',''] -> token_count 2 (quirk)
    "\tword",  # leading empty counts (quirk)
    "the cat and the hat",
    "THE The the",  # case-folded stopword hits
    "el la de y en",  # Spanish beats English
    "a, b. c!",  # punctuation-heavy
    "naïve café élève",  # unicode chars in nonclean class
    " lead and trail ",
    "le la de et les des",  # French
    "der die das und ist",
    "x" * 500,
    "1 2 3 4 5",
    None,
]


def _twin_df(spark):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_core_components_match_twins(spark):
    df = _twin_df(spark)
    t = F.col("text")
    ref = df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(t, r"\s", "")).cast("long").alias("nonws_chars"),
        (F.length(t) - F.length(F.regexp_replace(t, "[^0-9A-Za-z ]", "")))
        .cast("long")
        .alias("nonclean_chars"),
        TS.token_count(t).cast("long").alias("n_tokens"),
        TS._count_in(TS.tokens(t), TS.QUALITY_STOPWORDS).cast("long").alias("stop_hits"),
        *[
            TS._count_in(TS.tokens(t), words).cast("long").alias(f"s_{lang}")
            for lang, words in TS.LANG_STOPWORDS.items()
        ],
    ).orderBy("doc_id").toPandas()
    got = (
        TS.text_core_arrow(df).drop("text").orderBy("doc_id").toPandas()
    )
    assert list(ref.columns) == list(got.columns)
    for c in ref.columns:
        a, b = ref[c].astype("Int64"), got[c].astype("Int64")
        assert a.equals(b), f"{c}:\nref={a.tolist()}\ngot={b.tolist()}"


def test_driver_tails_match_column_twins(spark):
    """q_text_stats / q_lang_id rebuilt over the kernel must equal the
    original all-column expressions value-for-value."""
    import __spark_entry__ as E

    df = _twin_df(spark).where(F.col("text").isNotNull())
    t = F.col("text")
    ref = df.select(
        "doc_id",
        TS.token_count(t).cast("long").alias("n_tokens"),
        TS.bpe_token_count(t).cast("long").alias("n_bpe"),
        F.length(t).cast("long").alias("n_chars_txt"),
        F.round(TS.punct_ratio(t), 6).alias("punct_r"),
        F.round(TS.stopword_ratio(t), 6).alias("stop_r"),
        F.round(TS.mean_token_len(t), 6).alias("mean_tok"),
        TS.quality_score(t).alias("quality"),
        TS.lang_id(t).alias("lang_pred"),
    ).orderBy("doc_id").toPandas()

    core = TS.text_core_arrow(df)
    n_tok, n_ch = F.col("n_tokens"), F.col("n_chars")
    punct = F.when(n_ch == 0, F.lit(0.0)).otherwise(
        F.col("nonclean_chars").cast("double") / n_ch.cast("double")
    )
    stop = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.col("stop_hits").cast("double") / n_tok.cast("double")
    )
    mean_tok = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.col("nonws_chars").cast("double") / n_tok.cast("double")
    )
    nd = n_tok.cast("double")
    quality = F.round(
        (
            F.least(nd / F.lit(100.0), F.lit(1.0))
            + F.least(stop * F.lit(4.0), F.lit(1.0))
            + (F.lit(1.0) - F.least(punct * F.lit(5.0), F.lit(1.0)))
        )
        / F.lit(3.0),
        6,
    )
    got = core.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        TS.bpe_token_count(t).cast("long").alias("n_bpe"),
        n_ch.cast("long").alias("n_chars_txt"),
        F.round(punct, 6).alias("punct_r"),
        F.round(stop, 6).alias("stop_r"),
        F.round(mean_tok, 6).alias("mean_tok"),
        quality.alias("quality"),
        TS.lang_id_from_scores(
            {lang: F.col(f"s_{lang}") for lang in TS.LANG_STOPWORDS}
        ).alias("lang_pred"),
    ).orderBy("doc_id").toPandas()

    import pandas as pd

    pd.testing.assert_frame_equal(ref, got, check_exact=True)


def test_shingles_fast_bit_parity_with_jvm(spark):
    """shingles_fast (Arrow twin, the dedup hot path) must be
    bit-identical to the JVM expression form `shingles` — including the
    Spark edge semantics: trim strips ASCII spaces only, split keeps
    leading/trailing empty tokens, NULL text yields [''] (concat_ws over
    a NULL array), short docs yield their full token string, dedup keeps
    first-occurrence order."""
    cases = [
        "the quick brown fox jumps over the lazy dog",
        "a b", "a", "", " ", "   ", None,
        "  leading and trailing  ", "tab\tsep", "line\nbreak",
        "\t lead", "trail \t", "multi   space", "a b c d e f g",
        "\x0b vert", "\r\n crlf mix \r", "ümlaut wörds hëre",
        "dup dup dup dup", "x " * 300,
        "nbsp is not java ws",  # java \s is ASCII-only
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, t string"
    )
    for n in (2, 3, 5):
        a = {r["id"]: r["s"] for r in df.select("id", TS.shingles(F.col("t"), n).alias("s")).collect()}
        b = {r["id"]: r["s"] for r in df.select("id", TS.shingles_fast(F.col("t"), n).alias("s")).collect()}
        assert a == b, {i: (cases[i], a[i], b[i]) for i in a if a[i] != b[i]}


def test_shingles_fast_parity_on_documents_fixture(spark):
    doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["s"] for r in doc.select("doc_id", TS.shingles(F.col("text"), 3).alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in doc.select("doc_id", TS.shingles_fast(F.col("text"), 3).alias("s")).collect()}
    assert a == b
