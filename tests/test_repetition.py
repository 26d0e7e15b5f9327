"""Parity tests: the Arrow repetition-stats kernel must be bit-identical
to the HOF column-math twin (which the DuckDB oracle replays) on
adversarial texts — empty docs, whitespace-class edge cases (tab/VT/FF
that Java \\s splits on but F.trim does not strip), unicode incl.
non-BMP, duplicate-heavy and tie-heavy shapes, and nulls."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geotables_jl_spark.functions import textstats as TS

ADVERSARIAL = [
    "",
    " ",
    "\t\t",
    "\n",
    "\n\n\n",
    "a",
    "a a a a",
    "a b a b a",  # bigram "a b" x2 beats words
    "aa b\naa b\naa b",  # dup lines + repeated bigram
    "x\ny\nx\ny\nz",
    "one two\tthree\x0bfour\x0cfive\rsix",  # full Java \s class
    " lead and trail ",
    "naïve café naïve café",  # multibyte chars, repeated bigram
    "\U0001F600 \U0001F600 word",  # non-BMP: 1 char both engines
    "line\n\nline\n\n",  # empty-line dup class
    "w " * 50,  # one hot word
    "p q r s t u v w x y z " * 3,  # repeated long bigrams
    "Tie tie TIE Tie",  # case-sensitive classes
    None,
]


def test_arrow_matches_hof_columns(spark):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cols = TS.repetition_stats_cols(F.col("text"))
    ref = (
        df.select("doc_id", *[v.alias(k) for k, v in cols.items()])
        .orderBy("doc_id")
        .toPandas()
    )
    got = TS.repetition_stats_arrow(df).orderBy("doc_id").toPandas()

    assert list(ref.columns) == list(got.columns)
    for c in ref.columns:
        a = ref[c].astype("Int64")
        b = got[c].astype("Int64")
        assert a.equals(b), f"{c}:\nref={a.tolist()}\ngot={b.tolist()}"


def test_arrow_matches_on_random_docs(spark):
    import random

    rng = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "mat", "a", "bb", "ccc", "dddd", "é"]
    docs = []
    for i in range(200):
        n_lines = rng.randint(0, 6)
        lines = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            for _ in range(n_lines)
        ]
        # force duplicate lines sometimes
        if lines and rng.random() < 0.5:
            lines.append(rng.choice(lines))
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    cols = TS.repetition_stats_cols(F.col("text"))
    ref = (
        df.select("doc_id", *[v.alias(k) for k, v in cols.items()])
        .orderBy("doc_id")
        .toPandas()
    )
    got = TS.repetition_stats_arrow(df).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(
        ref.astype("Int64", errors="ignore"), got.astype("Int64", errors="ignore")
    )
