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
