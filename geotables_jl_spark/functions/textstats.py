"""Text analysis for web-scale training-data pipelines.

Everything here is pure JVM column expressions (``pyspark.sql.functions``
— split/filter/aggregate/regexp) so the hot path stays inside
whole-stage codegen: language-ID (stopword-hit heuristic), quality
scoring (length / punctuation / stopword ratios), token counting, and a
polynomial rolling-hash document fingerprint. Each is deliberately
ANSI-SQL-expressible so the DuckDB oracle can replay it exactly.

At 100 TB these are map-only stages fused into the scan — no shuffle, no
Python, no UDF.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-hit heuristic
#: (deterministic, dependency-free language ID — not a real classifier)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "is", "in", "to", "it"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
}

#: stopwords used by the quality score (English-ish)
QUALITY_STOPWORDS = ["the", "a", "and", "of", "is", "in", "to", "it", "that", "for"]

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization: array of non-empty tokens."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace-separated tokens (0 for empty/blank text)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


# GPT-2-style pre-tokenizer pattern, restricted to constructs RE2 also
# supports (no lookahead): contractions, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation runs. Whitespace
# itself is not a token (the lookahead-based whitespace merging of the
# original pattern only affects whitespace tokens, which BPE counters
# ignore anyway). Alternation order matters and is identical under
# Java's leftmost-first and RE2's leftmost-first semantics.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text: Column) -> Column:
    """Array of BPE-ish pre-tokens (GPT-2 pattern sans whitespace runs)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    """Number of BPE-ish pre-tokens — the LLM-pipeline token estimate
    (whitespace tokenization undercounts punctuation-heavy web text).
    Pure JVM regexp, map-only at any scale; ANSI-replicable (DuckDB
    ``len(regexp_extract_all(...))`` with the identical pattern)."""
    return F.size(bpe_tokens(text))


def _count_in(arr: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(arr, lambda t: F.array_contains(lit_arr, F.lower(t))))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (NULL-safe, 0 for empty)."""
    toks = tokens(text)
    n = token_count(text)
    hits = _count_in(toks, words or QUALITY_STOPWORDS)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or space."""
    n = F.length(text)
    clean = F.length(F.regexp_replace(text, "[^0-9A-Za-z ]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - clean).cast("double") / n.cast("double"))


def mean_token_len(text: Column) -> Column:
    # sum of token lengths == count of non-whitespace chars: one compiled
    # regex pass instead of an interpreted per-token fold (the fold ran at
    # ~100k lambda evals/s and dominated the text-stats stage)
    n = token_count(text)
    total = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(total.cast("double") / n.cast("double"))


def quality_score(text: Column) -> Column:
    """Deterministic [0, 1] quality heuristic: rewards mid-length docs with
    some stopwords and low punctuation noise (Gopher-rule-style gates
    without the thresholds — continuous version for ranking/filtering)."""
    n = token_count(text).cast("double")
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(5.0), F.lit(1.0))
    return F.round((len_term + stop_term + punct_term) / F.lit(3.0), 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    toks = tokens(text)
    return {lang: _count_in(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties broken by the fixed language
    order en > es > fr > de; no hits at all → 'und' (undetermined)."""
    return lang_id_from_scores(lang_scores(text))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling-hash fingerprint over the character codes:

        fp = fold(chars, 0, (acc, c) -> (acc * 31 + ascii(c)) mod 1e9+7)

    Pure column math (split + aggregate) — exact integer arithmetic, so
    any engine reproduces it bit-for-bit. Used for cheap content identity
    at scale (doc-level dedup key that survives storage format changes).
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )


def fingerprint_fast(text: Column) -> Column:
    """Arrow-vectorized twin of :func:`fingerprint` — identical values.

    The column-expression version folds an interpreted lambda per
    character (~100k evals/s); this one Horner-evaluates the whole batch
    in numpy: rows are LEFT-padded with zeros into one codepoint matrix
    (leading zeros don't change the polynomial), then one vectorized
    ``acc = (acc*31 + col) % p`` pass per character position. Exact
    integer math — bit-identical to the SQL form and the DuckDB oracle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _fp(s):  # no annotations: `from __future__ import annotations` stringizes them
        vals = s.fillna("").to_numpy()
        n = len(vals)
        if n == 0:
            return pd.Series([], dtype="int64")
        arrs = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in vals]
        L = max((len(a) for a in arrs), default=0)
        if L == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        M = np.zeros((n, L), dtype=np.uint64)
        for i, a in enumerate(arrs):
            if len(a):
                M[i, L - len(a):] = a
        acc = np.zeros(n, dtype=np.uint64)
        base = np.uint64(FP_BASE)
        mod = np.uint64(FP_MOD)
        for j in range(L):
            acc = (acc * base + M[:, j]) % mod  # acc*31+c < 2^35: no overflow
        return pd.Series(acc.astype(np.int64))

    return _fp(text)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash/Jaccard unit).

    transform over a 0..len-n sequence + slice + concat_ws — JVM only.
    Documents shorter than n tokens produce their full token string as a
    single shingle (so short docs still participate).

    This is the SQL-oracle reference form; the dedup hot paths call
    :func:`shingles_fast`, whose bit-parity with this expression is
    property-pinned in tests/test_textcore.py.
    """
    toks = tokens(text)
    cnt = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def shingles_fast(text: Column, n: int = 3) -> Column:
    """Arrow twin of :func:`shingles` — bit-identical output, built for
    the hot path. The JVM form's transform/slice/concat_ws lambdas are
    INTERPRETED per shingle (~75k shingles/s/core measured at sf0.1 —
    the dominant cost of every MinHash/Jaccard/SimHash query); this one
    is plain Python string ops over Arrow batches. Parity contract
    (pinned in tests/test_textcore.py): trim strips ASCII spaces only,
    split uses Java's ASCII ``\\s+`` with limit -1 (leading/trailing
    empty tokens kept exactly as Spark's ``split`` keeps them), short
    docs yield their full token string, first-occurrence-order dedup."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    nn = int(n)

    java_ws = _JAVA_WS  # captured by value: one whitespace class, three kernels

    @pandas_udf(T.ArrayType(T.StringType()))
    def _sh(s: pd.Series) -> pd.Series:
        import re

        ws = re.compile(java_ws)
        out = []
        for t in s:
            if t is None:
                # JVM parity: trim/split of NULL is NULL, size(NULL)=-1 →
                # one sequence slot, concat_ws over a NULL array is '' —
                # so shingles(NULL) is [''] (NOT NULL)
                out.append([""])
                continue
            toks = ws.split(t.strip(" "))
            m = max(len(toks) - (nn - 1), 1)
            out.append(list(dict.fromkeys(" ".join(toks[i : i + nn]) for i in range(m))))
        return pd.Series(out)

    return _sh(text)


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models" quality heuristics) — the duplicate-line / most-common-n-gram
# family used to filter boilerplate-heavy web pages. All exact integers
# (numerator/denominator separately) so the DuckDB oracle matches
# bit-for-bit with no float-fold concerns; all whole-row column math
# (higher-order functions, JVM-side) — map-only at any scale.
# ---------------------------------------------------------------------------


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _run_fold(arr: Column, per_item: str = "max_mass") -> Column:
    """Fold a SORTED array into run statistics without the O(n²)
    distinct×filter scan: state walks equal-element runs.

    per_item="max_mass": max over classes of count*length (the Gopher
    "fraction of characters in the most common n-gram" numerator).
    per_item="dup_mass": Σ over classes with count>1 of count*length
    ("fraction of characters in duplicate lines" numerator, counting
    every occurrence).
    """
    sorted_ = F.array_sort(arr)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("acc"),
    )

    def merge(st, w):
        is_run = w.eqNullSafe(st["prev"])
        run = F.when(is_run, st["run"] + 1).otherwise(F.lit(1).cast("long"))
        ln = F.length(w).cast("long")
        if per_item == "max_mass":
            acc = F.greatest(st["acc"], run * ln)
        else:  # dup_mass: a run reaching 2 retro-charges both occurrences
            acc = st["acc"] + F.when(run == 2, 2 * ln).when(run > 2, ln).otherwise(zero)
        return F.struct(w.alias("prev"), run.alias("run"), acc.alias("acc"))

    return F.aggregate(sorted_, init, merge, lambda st: st["acc"])


def _dup_count_fold(arr: Column) -> Column:
    """Number of elements of a SORTED array belonging to classes with
    count > 1 (counting every occurrence)."""
    sorted_ = F.array_sort(arr)
    zero = F.lit(0).cast("long")
    init = F.struct(F.lit(None).cast("string").alias("prev"), zero.alias("run"), zero.alias("acc"))

    def merge(st, w):
        is_run = w.eqNullSafe(st["prev"])
        run = F.when(is_run, st["run"] + 1).otherwise(F.lit(1).cast("long"))
        acc = st["acc"] + F.when(run == 2, F.lit(2).cast("long")).when(run > 2, F.lit(1).cast("long")).otherwise(zero)
        return F.struct(w.alias("prev"), run.alias("run"), acc.alias("acc"))

    return F.aggregate(sorted_, init, merge, lambda st: st["acc"])


def repetition_stats_cols(text: Column) -> dict[str, Column]:
    """Exact-integer repetition signals per document:

    - n_lines / n_dup_lines / dup_line_chars / line_chars — duplicate-line
      fraction numerators & denominators (a line is duplicate when its
      exact string occurs >1 time in the doc; chars count every
      occurrence)
    - n_words / word_chars / top_word_chars — most-common-word char mass
    - top_bigram_chars — most-common word-2-gram char mass (the bigram
      string includes its single joining space)
    """
    lines = _lines(text)
    words = F.filter(tokens(text), lambda t: t != "")
    nw = F.size(words).cast("long")
    bigrams = F.when(
        nw >= 2,
        F.transform(
            F.sequence(F.lit(1), (nw - 1).cast("int")),
            lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.lit(0).cast("long")
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_dup_lines": _dup_count_fold(lines),
        "dup_line_chars": _run_fold(lines, "dup_mass"),
        "line_chars": F.aggregate(lines, zero, lambda acc, x: acc + F.length(x).cast("long")),
        "n_words": nw,
        "word_chars": F.aggregate(words, zero, lambda acc, x: acc + F.length(x).cast("long")),
        "top_word_chars": _run_fold(words, "max_mass"),
        "top_bigram_chars": _run_fold(bigrams, "max_mass"),
    }


#: Java regex \s (no UNICODE_CHARACTER_CLASS): the exact whitespace class
#: Spark's split(trim(text), '\\s+') tokenizes on.
_JAVA_WS = "[ \t\n\x0b\x0c\r]+"

REPETITION_COLS = (
    "n_lines", "n_dup_lines", "dup_line_chars", "line_chars",
    "n_words", "word_chars", "top_word_chars", "top_bigram_chars",
)


def _repetition_batch(texts):
    """Vectorized numpy twin of ``repetition_stats_cols`` for one Arrow
    batch: class counting via factorize + lexsort-run detection, bigram
    classes as integer code pairs (words carry no whitespace, so the
    pair uniquely determines the joined string). Returns a dict of 8
    int64 arrays; exact-parity contract is property-tested in
    tests/test_repetition.py."""
    import itertools

    import numpy as np
    import pandas as pd

    n = len(texts)
    out = {c: np.zeros(n, dtype=np.int64) for c in REPETITION_COLS}

    def _runs(doc, codes):
        """Sort (doc, code) pairs; return per-run (doc, code, count)."""
        order = np.lexsort((codes, doc))
        d, c = doc[order], codes[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(d)))
        return d[starts], c[starts], cnt

    def _seg_max(doc_r, mass_r, out_arr):
        """Per-doc max over doc-sorted runs (missing docs stay 0)."""
        if len(doc_r) == 0:
            return
        first = np.ones(len(doc_r), dtype=bool)
        first[1:] = doc_r[1:] != doc_r[:-1]
        starts = np.flatnonzero(first)
        out_arr[doc_r[starts]] = np.maximum.reduceat(mass_r, starts)

    # ---- lines: split on literal \n -------------------------------------
    line_lists = [t.split("\n") for t in texts]
    n_per = np.fromiter((len(ls) for ls in line_lists), dtype=np.int64, count=n)
    out["n_lines"] = n_per
    flat = list(itertools.chain.from_iterable(line_lists))
    if flat:
        doc = np.repeat(np.arange(n, dtype=np.int64), n_per)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        lens = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
        out["line_chars"] = np.bincount(doc, weights=lens[codes], minlength=n).astype(np.int64)
        d_r, c_r, cnt = _runs(doc, codes)
        dup = cnt > 1
        out["n_dup_lines"] = np.bincount(d_r[dup], weights=cnt[dup], minlength=n).astype(np.int64)
        out["dup_line_chars"] = np.bincount(
            d_r[dup], weights=cnt[dup] * lens[c_r[dup]], minlength=n
        ).astype(np.int64)

    # ---- words: Java-\s split, empties dropped ---------------------------
    import re

    ws = re.compile(_JAVA_WS)
    word_lists = [[w for w in ws.split(t) if w] for t in texts]
    n_w = np.fromiter((len(ls) for ls in word_lists), dtype=np.int64, count=n)
    out["n_words"] = n_w
    wflat = list(itertools.chain.from_iterable(word_lists))
    if wflat:
        wdoc = np.repeat(np.arange(n, dtype=np.int64), n_w)
        wcodes, wuniq = pd.factorize(np.asarray(wflat, dtype=object))
        wlens = np.fromiter((len(u) for u in wuniq), dtype=np.int64, count=len(wuniq))
        out["word_chars"] = np.bincount(wdoc, weights=wlens[wcodes], minlength=n).astype(np.int64)
        d_r, c_r, cnt = _runs(wdoc, wcodes)
        _seg_max(d_r, cnt * wlens[c_r], out["top_word_chars"])

        # bigrams: consecutive kept-word pairs within a doc
        same = wdoc[1:] == wdoc[:-1]
        if same.any():
            a = wcodes[:-1][same].astype(np.int64)
            b = wcodes[1:][same].astype(np.int64)
            bdoc = wdoc[:-1][same]
            key = a * np.int64(len(wuniq)) + b
            bmass = wlens[a] + wlens[b] + 1  # the joining space
            order = np.lexsort((key, bdoc))
            d, k_, m = bdoc[order], key[order], bmass[order]
            new = np.ones(len(d), dtype=bool)
            new[1:] = (d[1:] != d[:-1]) | (k_[1:] != k_[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(d)))
            _seg_max(d[starts], cnt * m[starts], out["top_bigram_chars"])
    return out


#: integer text-stat components emitted by text_core_arrow; every float
#: (ratios, quality score, rounding) is rebuilt from these in codegen so
#: oracle bit-exactness is structural, not numerical luck.
TEXT_CORE_COLS = ("n_chars", "nonws_chars", "nonclean_chars", "n_tokens", "stop_hits")


def _text_core_batch(texts, lang_words: dict[str, list[str]], quality_words: list[str]):
    """Integer components for one Arrow batch. Exact-parity contracts
    with the column twins (tests/test_textcore.py):

    - n_chars = length(text) (codepoints);
    - nonws_chars = length(regexp_replace(text, '\\s', '')) — count of
      chars outside Java's \\s class;
    - nonclean_chars = chars outside [0-9A-Za-z ] (punct_ratio's
      numerator);
    - n_tokens = token_count(): 0 when trim(text) == '' (SQL trim —
      SPACES only), else size(split(trim(text), '\\s+')) INCLUDING the
      leading empty a non-space whitespace prefix produces (quirk
      parity);
    - stop_hits / per-language hits: tokens whose lower() equals a list
      word (empties never match, so counts are filter-invariant).
    """
    import itertools
    import re

    import numpy as np
    import pandas as pd

    n = len(texts)
    s = pd.Series(texts, dtype=object)
    out = {}
    out["n_chars"] = s.str.len().to_numpy(dtype=np.int64)
    out["nonws_chars"] = s.str.count("[^ \t\n\x0b\x0c\r]").to_numpy(dtype=np.int64)
    out["nonclean_chars"] = s.str.count("[^0-9A-Za-z ]").to_numpy(dtype=np.int64)

    ws = re.compile(_JAVA_WS)
    tok_lists = []
    n_tok = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        trimmed = t.strip(" ")  # SQL trim: spaces only, NOT tabs/newlines
        if trimmed == "":
            tok_lists.append([])
            continue
        toks = ws.split(trimmed)
        n_tok[i] = len(toks)  # keeps boundary empties — column-twin parity
        tok_lists.append([w for w in toks if w])  # empties never hit a stopword
    out["n_tokens"] = n_tok

    flat = list(itertools.chain.from_iterable(tok_lists))
    lang_cols = {f"s_{lang}": np.zeros(n, dtype=np.int64) for lang in lang_words}
    out["stop_hits"] = np.zeros(n, dtype=np.int64)
    if flat:
        doc = np.repeat(
            np.arange(n, dtype=np.int64),
            np.fromiter((len(ls) for ls in tok_lists), dtype=np.int64, count=n),
        )
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        low = np.array([u.lower() for u in uniq], dtype=object)

        def hits(words: list[str]) -> np.ndarray:
            mask = np.isin(low, np.array(words, dtype=object))
            return np.bincount(doc, weights=mask[codes], minlength=n).astype(np.int64)

        out["stop_hits"] = hits(quality_words)
        for lang, words in lang_words.items():
            lang_cols[f"s_{lang}"] = hits(words)
    out.update(lang_cols)
    return out


def text_core_arrow(df, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)):
    """ONE Arrow map emitting the integer text-stat components
    (``TEXT_CORE_COLS`` + per-language ``s_<lang>`` hit counts) plus the
    pass-through text column. The HOF column twins (``token_count``,
    ``stopword_ratio``'s filter, ``lang_scores``) evaluate interpreted —
    they disable whole-stage codegen for their stage; measured 37k
    rows/s (lang_id) / 28k rows/s (punct_ratio's regexp_replace string
    build) per 8 cores vs ~1M rows/s through this kernel. Ratios,
    quality score and rounding are NOT computed here — callers rebuild
    them in codegen from the integers, so DuckDB-oracle bit-exactness is
    structural. Null text → all-null components (twin parity)."""
    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    stat_cols = list(TEXT_CORE_COLS) + [f"s_{lang}" for lang in LANG_STOPWORDS]
    schema = (
        ", ".join(f"{c} {fields[c]}" for c in keep)
        + f", {text_col} string, "
        + ", ".join(f"{c} long" for c in stat_cols)
    )
    cols = list(keep) + [text_col]

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t = pdf[text_col]
            null = t.isna().to_numpy()
            stats = _text_core_batch(
                t.fillna("").tolist(), LANG_STOPWORDS, QUALITY_STOPWORDS
            )
            res = pdf[cols].copy()
            for c in stat_cols:
                col = pd.array(stats[c], dtype="Int64")
                if null.any():
                    col[null] = None
                res[c] = col
            yield res

    return df.select(*cols).mapInPandas(_iter, schema=schema)


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """argmax language from per-language hit-count COLUMNS — the exact
    tie/zero logic of :func:`lang_id`, reusable over precomputed counts
    (e.g. ``text_core_arrow``'s ``s_<lang>`` integers)."""
    order = list(LANG_STOPWORDS)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(order):
        sc = scores[lang]
        best_lang = F.when(sc >= best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(sc, best_score)
    any_hits = None
    for lang in order:
        any_hits = scores[lang] if any_hits is None else F.greatest(any_hits, scores[lang])
    return F.when(any_hits > 0, best_lang).otherwise(F.lit("und"))


def repetition_stats_arrow(df, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)):
    """Arrow-batched twin of ``repetition_stats_cols``: one mapInPandas
    stage computing all 8 Gopher repetition signals per row with
    factorize/bincount/lexsort numpy (no per-element interpreted fold).
    Bit-identical to the column version (null text rows yield all-null
    stats, matching the HOF columns' null propagation); ~20× its per-row
    throughput — the column twin is what the DuckDB oracle replays.
    Map-only at any scale, same plan class as the kNN kernel."""
    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(f"{c} {fields[c]}" for c in keep) + ", " + ", ".join(
        f"{c} long" for c in REPETITION_COLS
    )
    cols = list(keep) + [text_col]

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t = pdf[text_col]
            null = t.isna().to_numpy()
            stats = _repetition_batch(t.fillna("").tolist())
            res = pdf[list(keep)].copy()
            for c in REPETITION_COLS:
                col = pd.array(stats[c], dtype="Int64")
                # null text → NULL stats, except top_bigram_chars: the
                # column twin's when(nw>=2).otherwise(empty) swallows
                # the NULL size into the empty-array branch → fold = 0
                if null.any() and c != "top_bigram_chars":
                    col[null] = None
                res[c] = col
            yield res

    return df.select(*cols).mapInPandas(_iter, schema=schema)
