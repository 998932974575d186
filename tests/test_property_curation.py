"""Property-based differential tests for functions/curation.py: random
inputs vs independent pure-Python oracles (no Spark expressions shared).

Pinned properties:
* contamination_stats == a from-scratch Python n-gram overlap counter
  for ANY corpus/benchmark/n, on both the hashed and string gram paths
  (hash-path agreement also witnesses chained-hash injectivity on the
  example universe);
* luhn_valid == the textbook Luhn algorithm on arbitrary digit strings;
* mix_sample membership == the md5-threshold replica decision-for-
  decision, with per-group rates from the max-retention formula;
* redact_pii is idempotent and leaves zero residual matches for every
  redacted kind (the scrub actually scrubs, even with adversarial
  adjacency).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from great_expectations_spark.functions import curation as cur

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

# small word alphabet => real n-gram collisions between docs and bench
_WORDS = ["alpha", "beta", "Gamma", "delta", "x1", "Y2", "zz", ""]

word_soup = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=12
).map(lambda ws: "  ".join(ws))
maybe_text = st.one_of(st.none(), word_soup)


def _py_ngrams(text, n):
    if text is None:
        return set()
    words = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


@settings(**SETTINGS)
@given(
    docs=st.lists(maybe_text, min_size=0, max_size=8),
    bench=st.lists(word_soup, min_size=0, max_size=3),
    n=st.integers(min_value=1, max_value=4),
    hashed=st.booleans(),
)
def test_contamination_matches_python(spark, docs, bench, n, hashed):
    ddf = spark.createDataFrame(
        list(enumerate(docs)) or [(0, None)], "doc_id long, text string"
    )
    docs_eff = docs or [None]
    bdf = spark.createDataFrame(
        [(t,) for t in bench] or [(None,)], "text string"
    )
    bench_grams = set()
    for t in bench:
        bench_grams |= _py_ngrams(t, n)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["contaminated"])
        for r in cur.contamination_stats(
            ddf, bdf, n=n, hash_grams=hashed
        ).collect()
    }
    assert len(got) == len(docs_eff)
    for i, t in enumerate(docs_eff):
        grams = _py_ngrams(t, n)
        m = len(grams & bench_grams)
        assert got[i] == (len(grams), m, m >= 1), (i, t)


def _py_luhn(d):
    if not d:
        return False
    total = 0
    for pos, ch in enumerate(reversed(d)):
        v = int(ch)
        if pos % 2 == 1:
            v = v * 2 - 9 if v * 2 > 9 else v * 2
        total += v
    return total % 10 == 0


@settings(**SETTINGS)
@given(
    ds=st.lists(
        st.text(alphabet="0123456789", min_size=0, max_size=24),
        min_size=1,
        max_size=20,
    )
)
def test_luhn_matches_python(spark, ds):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(ds)], "i int, d string")
    got = {
        r["i"]: r["ok"]
        for r in df.select(
            "i", cur.luhn_valid(F.col("d")).alias("ok")
        ).collect()
    }
    for i, d in enumerate(ds):
        assert got[i] == _py_luhn(d), d


@settings(**SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=4),
    weights=st.lists(
        st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
    seed=st.sampled_from(["", "s1", "zz"]),
)
def test_mix_sample_matches_md5_replica(spark, sizes, weights, seed):
    k = min(len(sizes), len(weights))
    groups = [f"g{j}" for j in range(k)]
    rows = [
        (j * 1000 + i, groups[j])
        for j in range(k)
        for i in range(sizes[j])
    ]
    df = spark.createDataFrame(rows, "id long, source string")
    w = {groups[j]: weights[j] for j in range(k)}
    kept = sorted(
        r["id"]
        for r in cur.mix_sample(
            df, "source", w, key_columns=["id"], seed=seed
        ).collect()
    )
    counts = {groups[j]: sizes[j] for j in range(k)}
    rates, _ = cur.mixture_rates(counts, w)
    expect = sorted(
        i
        for i, g in rows
        if int(hashlib.md5(f"{i}{seed}".encode()).hexdigest()[:8], 16) / 2**32
        < rates[g]
    )
    assert kept == expect


_PII_FRAGMENTS = [
    "a@b.io",
    "x.y+z@mail.example.org",
    "4111 1111 1111 1111",
    "4111-1111-1111-1112",
    "123-45-6789",
    "(212) 555-9876",
    "415-555-1234",
    "10.0.0.1",
    "plain words",
    "",
    "9",
    "@",
    "1.2",
]


@settings(**SETTINGS)
@given(
    parts=st.lists(st.sampled_from(_PII_FRAGMENTS), min_size=0, max_size=6),
    sep=st.sampled_from([" ", "  ", " and ", ","]),
)
def test_redact_idempotent_and_scrubs(spark, parts, sep):
    text = sep.join(parts)
    df = spark.createDataFrame([(text,)], "text string")
    once = df.select(cur.redact_pii(F.col("text")).alias("r"))
    row = once.select(
        "r",
        cur.redact_pii(F.col("r")).alias("r2"),
        *[
            F.regexp_count("r", F.lit(pat)).alias(f"c_{kind}")
            for kind, pat in cur.PII_PATTERNS.items()
            if kind != "credit_card"
        ],
    ).first()
    assert row["r2"] == row["r"]  # idempotent
    for kind in cur.PII_PATTERNS:
        if kind != "credit_card":
            assert row[f"c_{kind}"] == 0, (kind, row["r"])


# ---------------------------------------------------------------------------
# C4 line-level cleaning (random pages vs a literal Python oracle)
# ---------------------------------------------------------------------------

_C4_LINES = [
    "",                                   # blank
    "word",                               # 1 word, terminal-less
    "three short words.",                 # kept
    "Tiny.",                              # < 3 words
    "please enable javascript now.",      # line drop word
    "Does this question count here?",     # kept, '?'
    "ends with end quote mark words\"",   # kept, '"'
    "no terminal punctuation on this",    # dropped
    "  padded   whitespace   line.  ",    # trims, kept
]
_C4_PAGE_POISON = ["", "lorem ipsum\n", "code { marker\n"]

c4_page = st.builds(
    lambda poison, lines: (poison + "\n".join(lines)) if lines or poison else None,
    st.sampled_from(_C4_PAGE_POISON),
    st.lists(st.sampled_from(_C4_LINES), min_size=0, max_size=10),
)


def _py_c4_clean(text, min_words=3, min_sentences=5):
    if text is None:
        return None
    kept = []
    for ln in text.split("\n"):
        ln = ln.strip()
        if not ln or not re.search(r'[.?!"]$', ln):
            continue
        if len(re.split(r"\s+", ln)) < min_words:
            continue
        if "javascript" in ln.lower():
            continue
        kept.append(ln)
    clean = "\n".join(kept)
    low = text.lower()
    if "lorem ipsum" in low or "{" in low:
        return None
    if len(re.findall(r"[.?!]", clean)) < min_sentences:
        return None
    return clean


@settings(**SETTINGS)
@given(
    pages=st.lists(c4_page, min_size=1, max_size=8),
    min_words=st.integers(min_value=1, max_value=4),
    min_sentences=st.integers(min_value=0, max_value=4),
)
def test_c4_matches_python(spark, pages, min_words, min_sentences):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id int, text string"
    )
    got = {
        r["id"]: (r["c4_keep"], r["c4_clean_text"])
        for r in cur.c4_stats(
            df, min_words_per_line=min_words, min_sentences=min_sentences
        ).collect()
    }
    for i, p in enumerate(pages):
        expect = _py_c4_clean(p, min_words, min_sentences)
        assert got[i][0] == (expect is not None), (i, p)
        assert got[i][1] == expect, (i, p)


# whitespace-adversarial text: Spark trim() strips ASCII spaces ONLY,
# \n/\t survive into normalize and become ''-tokens — the replica must
# reproduce that exactly (lowercase-only alphabet so Python str.lower
# and Java toLowerCase agree)
ws_text = st.text(
    alphabet="ab1é .\n\t", min_size=0, max_size=24
)
maybe_ws_text = st.one_of(st.none(), ws_text)

_DSIR_B = 32


def _dsir_feats_py(t):
    if t is None or not t.strip(" "):
        return []
    ws = re.sub("[ \t\n\x0b\f\r]+", " ", t.strip(" ").lower()).split(" ")
    bucket = lambda k: (
        int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % _DSIR_B + 1
    )
    return [bucket(w) for w in ws] + [
        bucket(ws[i - 1] + "\x01" + ws[i]) for i in range(1, len(ws))
    ]


@settings(**SETTINGS)
@given(
    target=st.lists(maybe_ws_text, min_size=0, max_size=5),
    raw=st.lists(maybe_ws_text, min_size=0, max_size=8),
    k=st.integers(min_value=1, max_value=6),
)
def test_dsir_selection_matches_python(spark, target, raw, k):
    """train → log-weight → Gumbel-top-k equals a from-scratch Python
    DSIR on arbitrary whitespace-adversarial corpora (md5 parity
    mode)."""
    import math

    # an anchor doc keeps both corpora featurizable (the no-features
    # ValueError path is unit-tested separately)
    target = target + ["anchor word"]
    raw = raw + ["anchor word"]
    tdf = spark.createDataFrame(
        list(enumerate(target)), "doc_id long, text string"
    )
    rdf = spark.createDataFrame(
        list(enumerate(raw)), "doc_id long, text string"
    )
    model = cur.train_dsir(
        tdf, rdf, n_buckets=_DSIR_B, hash_function="md5"
    )

    # python model
    tc, rc = [0] * _DSIR_B, [0] * _DSIR_B
    for t in target:
        for b in _dsir_feats_py(t):
            tc[b - 1] += 1
    for t in raw:
        for b in _dsir_feats_py(t):
            rc[b - 1] += 1
    tt, rt = sum(tc), sum(rc)
    ratio = [
        math.log((tc[b] + 1.0) / (tt + _DSIR_B))
        - math.log((rc[b] + 1.0) / (rt + _DSIR_B))
        for b in range(_DSIR_B)
    ]
    for got, want in zip(model["log_ratio"], ratio):
        assert abs(got - want) < 1e-12

    got_ids = {
        r["doc_id"]
        for r in cur.dsir_sample(
            rdf, model, k=k, id_column="doc_id", seed="p"
        ).collect()
    }
    keyed = []
    for i, t in enumerate(raw):
        feats = _dsir_feats_py(t)
        if not feats:
            continue
        lw = sum(ratio[b - 1] for b in feats)
        u = (
            int(hashlib.md5(f"{i}p".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        keyed.append((lw - math.log(-math.log(u)), -i))
    keyed.sort(reverse=True)
    assert got_ids == {-i for _, i in keyed[:k]}
