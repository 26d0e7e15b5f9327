"""gopher_quality_filter vs an independent per-doc Python oracle."""

import re
from collections import Counter

from geotables_jl_spark.functions.textstats import QUALITY_STOPWORDS
from geotables_jl_spark.operators.quality import gopher_quality_filter

TH = dict(
    min_words=5,
    max_words=60,
    min_mean_word_len=2.0,
    max_mean_word_len=9.0,
    max_symbol_ratio=0.1,
    min_stop_hits=1,
    max_dup_line_frac=0.5,
    max_dup_line_char_frac=0.4,
    max_top_word_char_frac=0.3,
    max_top_bigram_char_frac=0.3,
)


def _py_oracle(text):
    if text is None:
        names = [
            "r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_stopwords",
            "r_dup_lines", "r_dup_line_chars", "r_top_word", "r_top_bigram",
        ]
        return {n: False for n in names} | {"keep": False}
    n_chars = len(text)
    nonclean = len(re.findall(r"[^0-9A-Za-z ]", text))
    trimmed = text.strip(" ")
    toks = re.split("[ \t\n\x0b\x0c\r]+", trimmed) if trimmed else []
    words = [w for w in toks if w]
    stop_hits = sum(1 for w in words if w.lower() in QUALITY_STOPWORDS)
    lines = text.split("\n")
    lcnt = Counter(lines)
    n_dup_lines = sum(c for c in lcnt.values() if c > 1)
    dup_line_chars = sum(c * len(ln) for ln, c in lcnt.items() if c > 1)
    line_chars = sum(len(ln) for ln in lines)
    n_words, word_chars = len(words), sum(len(w) for w in words)
    wcnt = Counter(words)
    top_word_chars = max((c * len(w) for w, c in wcnt.items()), default=0)
    bigrams = [words[i] + " " + words[i + 1] for i in range(len(words) - 1)]
    bcnt = Counter(bigrams)
    top_bigram_chars = max((c * len(b) for b, c in bcnt.items()), default=0)

    def frac(num, den):
        return num / den if den > 0 else 0.0

    r = {
        "r_word_count": TH["min_words"] <= n_words <= TH["max_words"],
        "r_mean_word_len": TH["min_mean_word_len"]
        <= frac(word_chars, n_words)
        <= TH["max_mean_word_len"],
        "r_symbol_ratio": frac(nonclean, n_chars) <= TH["max_symbol_ratio"],
        "r_stopwords": stop_hits >= TH["min_stop_hits"],
        "r_dup_lines": frac(n_dup_lines, len(lines)) <= TH["max_dup_line_frac"],
        "r_dup_line_chars": frac(dup_line_chars, line_chars)
        <= TH["max_dup_line_char_frac"],
        "r_top_word": frac(top_word_chars, word_chars) <= TH["max_top_word_char_frac"],
        "r_top_bigram": frac(top_bigram_chars, word_chars)
        <= TH["max_top_bigram_char_frac"],
    }
    return r | {"keep": all(r.values())}


DOCS = [
    (1, "the quick brown fox jumps over a lazy dog in the warm sun today"),
    (2, ""),
    (3, None),
    (4, "spam spam spam spam spam spam spam spam"),
    (5, "line one is here\nline one is here\nline one is here\nthe end of it"),
    (6, "@@@ ### !!! $$$ %%% the of a in it is to for and that words here"),
    (7, "a b c d e f g h i j k l m n o p"),
    (8, "  the   gap separated   words of a    document with odd   spacing  "),
    (9, "the " + "beautiful dream " * 20),
    (10, "one two\tthree\nfour the of in a is it to for words enough here now"),
]


def test_quality_filter_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_filter(df, **TH).collect()}
    assert set(out) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _py_oracle(text)
        got = out[doc_id]
        for k, v in want.items():
            assert got[k] == v, (doc_id, k, got, want)


def test_quality_filter_plan_is_map_only(spark):
    df = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    plan = gopher_quality_filter(df, **TH)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_quality_filter_on_documents_table(spark):
    doc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = gopher_quality_filter(doc)
    n = out.count()
    assert n == doc.count()
    kept = out.filter("keep").count()
    assert 0 <= kept <= n
