"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation is JVM-side (``pyspark.sql.functions`` — regexp,
split, hash) except :func:`language_id`, which dispatches to the
Arrow-batched Cavnar–Trenkle classifier (``langid.py``; never per-row
Python).  These compose with the validation engine (each returns a Column
usable in expectations) and are exposed as first-class queries in
``__spark_entry__.py``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Public knowledge (common function words).
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "nicht"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"
WORD_SPLIT = r"\s+"
# BPE-ish token regex: words, numbers, or single non-space symbols
BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, WORD_SPLIT))
    )


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the BPE-style regex (JVM regexp)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(col, F.lit(PUNCT_CLASS)) / F.length(col)
    )


def uppercase_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(col, F.lit("[A-Z]")) / F.length(col)
    )


def digit_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(col, F.lit("[0-9]")) / F.length(col)
    )


def stopword_count(col: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(col, F.lit(pattern))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = token_count(col)
    return F.when(toks == 0, F.lit(0.0)).otherwise(
        stopword_count(col, lang) / toks
    )


def quality_score(col: Column) -> Column:
    """Heuristic 0-1 quality score from length / punctuation / stopword
    signals (the usual pretraining-filter features).  Pure arithmetic over
    JVM expressions; SQL-portable so it can be oracle-checked."""
    length = F.length(col)
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    punct = punct_ratio(col)
    punct_score = F.lit(1.0) - F.least(punct * F.lit(5.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    return F.when(col.isNull() | (length == 0), F.lit(0.0)).otherwise(
        F.round(
            len_score * F.lit(0.4)
            + punct_score * F.lit(0.3)
            + stop_score * F.lit(0.3),
            6,
        )
    )


def language_id(col: Column) -> Column:
    """Language ID: the real Cavnar–Trenkle char-n-gram classifier
    (20 languages, rank-order out-of-place distance, Arrow-batched —
    ``functions/langid.py``).  This is the documented public name, so it
    must return classifier quality, not placeholder quality; the
    4-language stopword argmax it used to alias is still available as
    :func:`language_id_fast` for pure-JVM pipelines that accept the
    quality trade."""
    from great_expectations_spark.functions.langid import language_id_ct

    return language_id_ct(col)


def language_id_fast(
    col: Column, languages: Optional[List[str]] = None
) -> Column:
    """Stopword-hit language ID: argmax over per-language stopword counts;
    'und' when nothing matches.  One pass of JVM regexp counts; the argmax
    rides on struct ordering (greatest compares field-by-field).  A cheap
    heuristic (4 languages, placeholder quality) — prefer
    :func:`language_id` (Cavnar–Trenkle) unless the pipeline must stay
    entirely JVM-side."""
    langs = languages or list(LANG_STOPWORDS)
    scored = [
        F.struct(
            stopword_count(col, lang).alias("score"), F.lit(lang).alias("lang")
        )
        for lang in langs
    ]
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    return F.when(
        col.isNull() | (best.getField("score") == 0), F.lit("und")
    ).otherwise(best.getField("lang"))


def normalize_text(col: Column) -> Column:
    """lowercase + collapse whitespace — the canonical form used by
    fingerprints and dedup."""
    return F.regexp_replace(F.lower(F.trim(col)), WORD_SPLIT, " ")


def fingerprint64(col: Column) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64)."""
    return F.xxhash64(normalize_text(col))


def rolling_fingerprints(col: Column, k: int = 5) -> Column:
    """Array of 64-bit rolling window (k-word shingle) hashes — the basis
    for winnowing-style fingerprinting and MinHash."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    return F.when(n < k, F.array(F.xxhash64(normalize_text(col)))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, k))),
        )
    )


def text_profile(
    df: DataFrame, column: str = "text", fast_lang: bool = False
) -> DataFrame:
    """Per-document feature frame: token counts, ratios, lang, quality,
    fingerprint — one projection, zero shuffles.  ``lang_pred`` comes
    from the Cavnar–Trenkle classifier (one Arrow-batched pandas UDF in
    the projection); pass ``fast_lang=True`` to keep the whole profile
    JVM-side with the 4-language stopword heuristic instead."""
    col = F.col(column)
    lang = language_id_fast(col) if fast_lang else language_id(col)
    return df.select(
        "*",
        token_count(col).alias("n_tokens"),
        bpe_token_count(col).alias("n_bpe_tokens"),
        F.round(punct_ratio(col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(col), 6).alias("stopword_ratio"),
        quality_score(col).alias("quality_score"),
        lang.alias("lang_pred"),
        fingerprint64(col).alias("fingerprint"),
    )


#: Gopher quality-filter stopword set (Rae et al. 2021, Table A1): a
#: document must contain at least 2 of these to pass the stopword rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Default rule thresholds (Rae et al. 2021, Table A1).  ``None`` skips
#: a rule.  The repetition thresholds apply only when
#: ``gopher_rules(..., with_repetition=True)`` (they need the Arrow
#: repetition pass); top-2/3-gram use the paper's numbers, the line
#: thresholds are the paper's duplicate-line numbers.
GOPHER_DEFAULTS: Dict[str, object] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopwords": 2,
    # with_repetition=True only:
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_bigram_char_frac": 0.20,
    "max_top_trigram_char_frac": 0.18,
}


def gopher_signals(col: Column) -> Dict[str, Column]:
    """Gopher-rule raw signals as JVM columns (zero UDFs): word count,
    mean word length, symbol-to-word ratio (``#`` + ellipses), bullet /
    ellipsis line fractions, alphabetic-word fraction, and how many of
    the 8 :data:`GOPHER_STOPWORDS` appear (whole-word,
    case-insensitive).  Null/blank text yields 0 words and null ratios
    (it fails the word-count rule, so the gate never reads the nulls).
    """
    t = F.coalesce(col, F.lit(""))
    words = F.filter(
        F.split(F.trim(t), WORD_SPLIT), lambda w: F.length(w) > 0
    )
    n_words = F.size(words)
    nw = F.when(n_words > 0, n_words.cast("double"))  # null if 0 words
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0))
    )
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda ln: F.trim(ln)),
        lambda ln: F.length(ln) > 0,
    )
    n_lines = F.size(lines)
    nl = F.when(n_lines > 0, n_lines.cast("double"))
    bullet_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^[•‣◦*-]"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
    low = F.lower(t)
    n_stop = None
    for w in GOPHER_STOPWORDS:
        term = low.rlike(rf"\b{w}\b").cast("int")
        n_stop = term if n_stop is None else (n_stop + term)
    return {
        "n_words": n_words.cast("int"),
        "mean_word_len": total_chars.cast("double") / nw,
        "symbol_word_ratio": n_symbols.cast("double") / nw,
        "bullet_line_frac": bullet_lines.cast("double") / nl,
        "ellipsis_line_frac": ellipsis_lines.cast("double") / nl,
        "alpha_word_frac": alpha_words.cast("double") / nw,
        "n_stopwords": n_stop.cast("int"),
    }


def _merge_gopher_thresholds(
    thresholds: Optional[Dict[str, object]],
) -> Dict[str, object]:
    th = dict(GOPHER_DEFAULTS)
    unknown = set(thresholds or {}) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(
            f"unknown gopher threshold keys {sorted(unknown)}; "
            f"valid: {sorted(GOPHER_DEFAULTS)}"
        )
    th.update(thresholds or {})
    return th


def _gopher_rule_map(
    sig: Dict[str, Column], th: Dict[str, object]
) -> Dict[str, Column]:
    """Per-rule boolean Columns from signal Columns (structural rules
    only; null comparisons coalesce to False so a null/empty text fails
    the gate through its rules, never through a null verdict)."""
    rules: Dict[str, Column] = {}

    def add(name: str, cond: Optional[Column]) -> None:
        if cond is not None:
            rules[name] = F.coalesce(cond, F.lit(False))

    if th["min_words"] is not None or th["max_words"] is not None:
        lo = th["min_words"] if th["min_words"] is not None else 0
        hi = th["max_words"] if th["max_words"] is not None else 1 << 62
        add("rule_word_count", sig["n_words"].between(int(lo), int(hi)))
    if th["min_mean_word_len"] is not None or th["max_mean_word_len"] is not None:
        cond = None
        if th["min_mean_word_len"] is not None:
            cond = sig["mean_word_len"] >= float(th["min_mean_word_len"])
        if th["max_mean_word_len"] is not None:
            upper = sig["mean_word_len"] <= float(th["max_mean_word_len"])
            cond = upper if cond is None else (cond & upper)
        add("rule_mean_word_len", cond)
    if th["max_symbol_word_ratio"] is not None:
        add(
            "rule_symbol_ratio",
            sig["symbol_word_ratio"] <= float(th["max_symbol_word_ratio"]),
        )
    if th["max_bullet_line_frac"] is not None:
        add(
            "rule_bullet_lines",
            F.coalesce(sig["bullet_line_frac"], F.lit(0.0))
            <= float(th["max_bullet_line_frac"]),
        )
    if th["max_ellipsis_line_frac"] is not None:
        add(
            "rule_ellipsis_lines",
            F.coalesce(sig["ellipsis_line_frac"], F.lit(0.0))
            <= float(th["max_ellipsis_line_frac"]),
        )
    if th["min_alpha_word_frac"] is not None:
        add(
            "rule_alpha_words",
            sig["alpha_word_frac"] >= float(th["min_alpha_word_frac"]),
        )
    if th["min_stopwords"] is not None:
        add(
            "rule_stopwords",
            sig["n_stopwords"] >= int(th["min_stopwords"]),
        )
    return rules


def gopher_keep_expr(
    col: Column, thresholds: Optional[Dict[str, object]] = None
) -> Column:
    """The Gopher structural gate as ONE boolean Column — usable inside
    any projection, aggregation, or expectation (the repetition-stat
    rules need the Arrow pass and live only in :func:`gopher_rules`)."""
    th = _merge_gopher_thresholds(thresholds)
    rules = _gopher_rule_map(gopher_signals(col), th)
    keep = F.lit(True)
    for cond in rules.values():
        keep = keep & cond
    return keep


def gopher_rules(
    df: DataFrame,
    text_column: str = "text",
    thresholds: Optional[Dict[str, object]] = None,
    with_repetition: bool = False,
) -> DataFrame:
    """Gopher quality gate (Rae et al. 2021 "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", Table A1 —
    public paper): appends the :func:`gopher_signals` columns
    (``gopher_`` prefix), one boolean per rule (``rule_*``), and the
    conjunction ``gopher_keep``.

    All structural rules are pure JVM expressions in ONE projection (no
    shuffle, no Python).  ``with_repetition=True`` additionally runs
    :func:`repetition_stats` (Arrow-batched — the per-document n-gram
    loops Catalyst can't express) and applies the duplicate-line /
    top-n-gram character-fraction thresholds; null repetition stats
    (null text) fail the gate via the word-count rule, not the
    repetition rules (null comparisons stay null and are coalesced
    true).  ``thresholds`` overrides any :data:`GOPHER_DEFAULTS` key;
    set a key to None to disable that rule."""
    th = _merge_gopher_thresholds(thresholds)
    if with_repetition:
        df = repetition_stats(df, text_column=text_column)
    sig = gopher_signals(F.col(text_column))
    out = df.select(
        "*", *[c.alias(f"gopher_{k}") for k, c in sig.items()]
    )
    rules = _gopher_rule_map(
        {k: F.col(f"gopher_{k}") for k in sig}, th
    )
    if with_repetition:
        rep_map = {
            "max_dup_line_frac": "dup_line_frac",
            "max_dup_line_char_frac": "dup_line_char_frac",
            "max_top_bigram_char_frac": "top_bigram_char_frac",
            "max_top_trigram_char_frac": "top_trigram_char_frac",
        }
        for key, colname in rep_map.items():
            if th.get(key) is not None:
                rules[f"rule_{colname}"] = F.coalesce(
                    F.col(colname) <= float(th[key]), F.lit(True)
                )
    keep = F.lit(True)
    for cond in rules.values():
        keep = keep & cond
    return out.select(
        "*",
        *[c.alias(k) for k, c in rules.items()],
        keep.alias("gopher_keep"),
    )


def gopher_filter(
    df: DataFrame,
    text_column: str = "text",
    thresholds: Optional[Dict[str, object]] = None,
    with_repetition: bool = False,
) -> DataFrame:
    """Apply the Gopher gate and return only passing rows with the
    original columns (the filtering form of :func:`gopher_rules`)."""
    flagged = gopher_rules(
        df,
        text_column=text_column,
        thresholds=thresholds,
        with_repetition=with_repetition,
    )
    return flagged.filter(F.col("gopher_keep")).select(*df.columns)


def repetition_stats(
    df: DataFrame, text_column: str = "text", id_columns: Optional[List[str]] = None
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1 — public paper), the
    standard quality filters an LLM training pipeline runs after dedup:

    * ``dup_line_frac`` — fraction of lines that are exact repeats of an
      earlier line (boilerplate / scraped-menu detector);
    * ``dup_line_char_frac`` — fraction of CHARACTERS inside those
      repeated lines;
    * ``top_bigram_char_frac`` / ``top_trigram_char_frac`` — fraction of
      characters covered by occurrences of the single most frequent word
      2-/3-gram (loop-y spam detector);
    * ``dup_trigram_char_frac`` — fraction of characters inside word
      trigrams that occur more than once;
    * ``unigram_entropy`` — Shannon entropy (nats) of the word unigram
      distribution (degenerate-text detector).

    One Arrow batch per partition (`mapInPandas`-free pandas UDF returning
    a struct) — same engine policy as MinHash/ngram shingles: these are
    per-document token loops Catalyst can't vectorize.  Null/empty text
    yields null stats.  Keeps all input columns (or only ``id_columns``
    if given) and appends the struct fields as top-level columns.
    """
    from pyspark.sql import types as T

    fields = [
        "dup_line_frac",
        "dup_line_char_frac",
        "top_bigram_char_frac",
        "top_trigram_char_frac",
        "dup_trigram_char_frac",
        "unigram_entropy",
    ]

    @F.pandas_udf(
        T.StructType([T.StructField(f, T.DoubleType()) for f in fields])
    )
    def stats(texts: pd.Series) -> pd.DataFrame:
        import math
        from collections import Counter

        def one(t):
            if t is None or not t.strip():
                return (None,) * 6
            lines = [ln for ln in t.splitlines() if ln.strip()]
            if lines:
                seen, dup_lines, dup_chars = set(), 0, 0
                for ln in lines:
                    if ln in seen:
                        dup_lines += 1
                        dup_chars += len(ln)
                    else:
                        seen.add(ln)
                total_line_chars = sum(len(ln) for ln in lines) or 1
                dlf = dup_lines / len(lines)
                dlcf = dup_chars / total_line_chars
            else:
                dlf = dlcf = 0.0
            words = t.split()
            n_chars = sum(len(w) for w in words) or 1
            if not words:
                return (dlf, dlcf, 0.0, 0.0, 0.0, 0.0)

            def ngram_fracs(n):
                if len(words) < n:
                    return 0.0, 0.0
                grams = [
                    tuple(words[i : i + n])
                    for i in range(len(words) - n + 1)
                ]
                counts = Counter(grams)
                top_gram, top_cnt = counts.most_common(1)[0]
                top_chars = top_cnt * sum(len(w) for w in top_gram)
                dup_chars = sum(
                    c * sum(len(w) for w in g)
                    for g, c in counts.items()
                    if c > 1
                )
                return top_chars / n_chars, dup_chars / n_chars

            top2, _ = ngram_fracs(2)
            top3, dup3 = ngram_fracs(3)
            uni = Counter(words)
            total = len(words)
            ent = -sum(
                (c / total) * math.log(c / total) for c in uni.values()
            )
            return (dlf, dlcf, min(top2, 1.0), min(top3, 1.0),
                    min(dup3, 1.0), ent)

        rows = [one(t) for t in texts]
        # dtype=object keeps None as SQL null — a float64 frame would
        # silently coerce it to NaN, which Spark stores as NaN, not null
        return pd.DataFrame(rows, columns=fields, dtype=object)

    cols = id_columns if id_columns else df.columns
    out = df.select(
        *cols, stats(F.col(text_column)).alias("__gx_rep")
    )
    return out.select(*cols, *[F.col(f"__gx_rep.{f}") for f in fields])
