"""C4 line-level cleaning (Raffel et al. 2020 §2.2) and the Gopher
quality gate (Rae et al. 2021, Table A1) — rule-by-rule unit coverage
plus a pure-Python differential oracle for the C4 cleaner."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from great_expectations_spark.functions import curation
from great_expectations_spark.functions.text import (
    GOPHER_STOPWORDS,
    gopher_filter,
    gopher_rules,
)

# ---------------------------------------------------------------------------
# C4
# ---------------------------------------------------------------------------

GOOD_PAGE = "\n".join(
    [
        "This is a perfectly normal sentence with many words in it.",
        "Here is another full sentence that also ends properly.",
        "A third sentence keeps the page above the sentence minimum.",
        "Does the page still read naturally after four sentences?",
        'The last line ends with an end quotation mark."',
    ]
)


def _py_c4(text, min_words=3, min_sentences=5):
    """Literal Python re-implementation of the documented rules."""
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


def test_c4_line_rules(spark):
    rows = [
        (1, GOOD_PAGE),
        # line-level drops: no terminal punct / too short / javascript
        (
            2,
            GOOD_PAGE
            + "\nmenu home about contact\nOk.\n"
            + "Please enable JavaScript to view this page properly.",
        ),
        (3, "Lorem ipsum dolor sit amet.\n" + GOOD_PAGE),  # page drop
        (4, "function f() { return 1; }\n" + GOOD_PAGE),  # code page drop
        (5, "Too few sentences here.\nOnly two of them exist."),
        (6, None),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in curation.c4_stats(df).orderBy("doc_id").collect()
    }
    for i, text in rows:
        expect = _py_c4(text)
        assert got[i]["c4_keep"] == (expect is not None), f"doc {i}"
        assert got[i]["c4_clean_text"] == expect, f"doc {i}"
    # the short/menu/javascript lines were dropped but the page survives
    assert got[2]["c4_keep"] is True
    assert "menu home" not in got[2]["c4_clean_text"]
    assert "JavaScript" not in got[2]["c4_clean_text"]
    # "Ok." (1 word < 3) dropped too: only the 5 GOOD_PAGE lines survive
    assert got[2]["c4_n_kept_lines"] == 5
    assert got[1]["c4_n_kept_lines"] == 5


def test_c4_clean_filters_and_rewrites(spark):
    rows = [(1, GOOD_PAGE), (2, "Lorem ipsum dolor sit amet."), (3, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = curation.c4_clean(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == _py_c4(GOOD_PAGE)
    assert out[0]["text"].count("\n") == 4


def test_c4_bad_words_and_overrides(spark):
    df = spark.createDataFrame(
        [(1, GOOD_PAGE), (2, GOOD_PAGE + "\nGambling spam sentence here.")],
        "doc_id int, text string",
    )
    sig_kept = curation.c4_clean(df, bad_words=["gambling"]).collect()
    assert [r["doc_id"] for r in sig_kept] == [1]
    # word-boundary: 'gamblingX' must NOT trigger the bad-word page drop
    df2 = spark.createDataFrame(
        [(1, GOOD_PAGE + "\nThe gamblingx compound word is fine here.")],
        "doc_id int, text string",
    )
    assert curation.c4_clean(df2, bad_words=["gambling"]).count() == 1
    # relaxed thresholds keep the two-sentence page
    df3 = spark.createDataFrame(
        [(5, "Too few sentences here.\nOnly two of them exist.")],
        "doc_id int, text string",
    )
    assert curation.c4_clean(df3, min_sentences=2).count() == 1


def test_c4_stage_in_curate_corpus(spark):
    df = spark.createDataFrame(
        [(1, GOOD_PAGE), (2, "Lorem ipsum dolor sit amet."), (3, None)],
        "doc_id int, text string",
    )
    out, report = curation.curate_corpus(df, c4=True, with_report=True)
    assert out.count() == 1
    stages = [r["stage"] for r in report]
    assert stages == ["input", "c4_clean"]


def test_c4_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, GOOD_PAGE)], "doc_id int, text string")
    plan = curation.c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection+filter, no shuffle


# ---------------------------------------------------------------------------
# Gopher
# ---------------------------------------------------------------------------

PROSE = (
    "The quick brown fox jumps over the lazy dog and keeps running "
    "to be sure that it will have covered enough distance with ease. "
) * 5  # ~110 words, all rules pass


def test_gopher_signals_and_keep(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id int, text string")
    row = gopher_rules(df).collect()[0]
    assert row["gopher_n_words"] == 120
    assert 3.0 <= row["gopher_mean_word_len"] <= 10.0
    assert row["gopher_symbol_word_ratio"] == 0.0
    assert row["gopher_alpha_word_frac"] == 1.0
    assert row["gopher_n_stopwords"] >= 6
    assert row["gopher_keep"] is True


def test_gopher_individual_rules(spark):
    short = "Just five little words here."
    symbols = " ".join(["lorem#ipsum#tag"] * 60)
    bullets = "\n".join(["• bullet item listed"] * 10) + "\n" + PROSE
    ellipsis = "\n".join(["this sentence trails off..."] * 10)
    numeric = " ".join(["1234 5678 9012"] * 30)
    no_stop = " ".join(["zyx wvu tsr qpo nml"] * 20)
    df = spark.createDataFrame(
        [
            (1, short),
            (2, symbols),
            (3, bullets),
            (4, ellipsis),
            (5, numeric),
            (6, no_stop),
            (7, None),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert rows[1]["rule_word_count"] is False  # < 50 words
    assert rows[2]["rule_symbol_ratio"] is False  # 2 '#' per 1 word
    assert rows[3]["rule_bullet_lines"] is False  # 10/15 lines... no:
    # 10 bullet lines / (10 + prose-as-one-line) = 10/11 > 0.9
    assert rows[4]["rule_ellipsis_lines"] is False  # 100% > 30%
    assert rows[5]["rule_alpha_words"] is False  # all-numeric words
    assert rows[6]["rule_stopwords"] is False
    assert rows[7]["rule_word_count"] is False  # null text -> 0 words
    for i in range(1, 8):
        assert rows[i]["gopher_keep"] is False


def test_gopher_threshold_overrides_and_filter(spark):
    df = spark.createDataFrame(
        [(1, PROSE), (2, "Count the words of this one.")],
        "doc_id int, text string",
    )
    kept = gopher_filter(df)
    assert kept.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # disable the word-count rule -> doc 2 passes every remaining rule
    relaxed = gopher_filter(df, thresholds={"min_words": None, "max_words": None})
    assert relaxed.count() == 2
    flagged = gopher_rules(df, thresholds={"min_words": None, "max_words": None})
    assert "rule_word_count" not in flagged.columns


def test_gopher_with_repetition(spark):
    loop = ("spam ham jam " * 60).strip()  # one dominant trigram
    df = spark.createDataFrame(
        [(1, PROSE), (2, loop)], "doc_id int, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_rules(df, with_repetition=True).collect()
    }
    assert rows[1]["gopher_keep"] is True
    assert rows[2]["rule_top_trigram_char_frac"] is False
    assert rows[2]["gopher_keep"] is False


def test_gopher_plan_is_jvm_only_without_repetition(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id int, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_gopher_stopword_list_is_papers(spark):
    assert GOPHER_STOPWORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-level) decontamination
# ---------------------------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, embedding array<double>"
    )


def test_semantic_matmul_exact(spark):
    corpus = _emb_df(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),   # exact benchmark copy -> 1.0
            (2, [0.9, 0.1, 0.0]),   # near the first benchmark vector
            (3, [0.0, 0.0, 1.0]),   # orthogonal to both -> 0.0
            (4, None),              # null embedding -> null sim, kept
        ],
    )
    bench = _emb_df(spark, [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])])
    got = {
        r["doc_id"]: r
        for r in curation.semantic_contamination_stats(
            corpus, bench, threshold=0.95
        ).collect()
    }
    assert abs(got[1]["bench_max_sim"] - 1.0) < 1e-12
    import math
    expect2 = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(got[2]["bench_max_sim"] - expect2) < 1e-12
    assert abs(got[3]["bench_max_sim"] - 0.0) < 1e-12
    assert got[4]["bench_max_sim"] is None
    # cos(doc2, bench100) = 0.9/sqrt(0.82) ~= 0.994 >= 0.95 -> contaminated
    assert [got[i]["contaminated"] for i in (1, 2, 3, 4)] == [
        True, True, False, False,
    ]
    kept = curation.semantic_decontaminate(corpus, bench, threshold=0.95)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]
    assert kept.columns == ["doc_id", "embedding"]


def test_semantic_lsh_agrees_on_high_threshold(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 16))
    rows, bench_rows = [], []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 3:  # benchmark = slightly perturbed copies of 3 vectors
            bench_rows.append(
                (100 + i, [float(x) for x in v + rng.normal(scale=1e-4, size=16)])
            )
    corpus, bench = _emb_df(spark, rows), _emb_df(spark, bench_rows)
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in curation.semantic_contamination_stats(
            corpus, bench, threshold=0.99
        ).collect()
    }
    approx = {
        r["doc_id"]: r["contaminated"]
        for r in curation.semantic_contamination_stats(
            corpus, bench, threshold=0.99, method="lsh", n_bits=8
        ).collect()
    }
    # near-copies collide on every sign bit -> LSH finds all three
    assert exact == approx
    assert sum(exact.values()) == 3


def test_semantic_guards(spark):
    corpus = _emb_df(spark, [(1, [1.0, 0.0])])
    bench = _emb_df(spark, [(9, [1.0, 0.0]), (10, [0.0, 1.0])])
    try:
        curation.semantic_contamination_stats(
            corpus, bench, max_benchmark_rows=1
        )
        assert False, "cap not enforced"
    except ValueError as e:
        assert "max_benchmark_rows" in str(e)
    empty = _emb_df(spark, [])
    out = curation.semantic_contamination_stats(corpus, empty).collect()
    assert out[0]["contaminated"] is False
    assert out[0]["bench_max_sim"] is None


def test_semantic_matmul_plan_has_no_shuffle(spark):
    corpus = _emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    bench = _emb_df(spark, [(9, [1.0, 0.0])])
    flagged = curation.semantic_contamination_stats(corpus, bench)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure linear scan + Arrow UDF


def test_curate_corpus_gopher_and_semantic_stages(spark):
    df = spark.createDataFrame(
        [
            (1, PROSE, [1.0, 0.0]),
            (2, PROSE, [0.0, 1.0]),
            (3, "too short", [0.5, 0.5]),
        ],
        "doc_id int, text string, embedding array<double>",
    )
    bench = _emb_df(spark, [(9, [2.0, 0.0])])
    out, report = curation.curate_corpus(
        df,
        gopher=True,
        semantic_benchmark_df=bench,
        semantic_threshold=0.99,
        with_report=True,
    )
    assert [r["stage"] for r in report] == [
        "input", "gopher", "semantic_decontaminate",
    ]
    # doc 3 fails gopher; doc 1 is semantically contaminated (cos=1)
    assert sorted(r["doc_id"] for r in out.collect()) == [2]


def test_c4_gopher_work_under_structured_streaming(spark, tmp_path):
    """Both gates are stateless projections, so they compose with
    readStream unchanged — the streaming corpus-curation path."""
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [(1, GOOD_PAGE), (2, "Lorem ipsum dolor sit amet."), (3, PROSE)],
        "doc_id int, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id int, text string").parquet(src)
    flagged = gopher_rules(curation.c4_stats(stream)).select(
        "doc_id", "c4_keep", "gopher_keep"
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("gx_c4_gopher")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["doc_id"]: r
        for r in spark.sql("SELECT * FROM gx_c4_gopher").collect()
    }
    assert rows[1]["c4_keep"] is True and rows[2]["c4_keep"] is False
    # PROSE is one long unpunctuated-line page: C4 keeps the line (ends
    # with '.') and Gopher passes it outright
    assert rows[3]["gopher_keep"] is True


def test_gopher_unknown_threshold_key_rejected(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id int, text string")
    try:
        gopher_rules(df, thresholds={"min_wordz": 10})
        assert False, "typo key accepted"
    except ValueError as e:
        assert "min_wordz" in str(e)


def test_gopher_mean_word_len_bounds_disable_independently(spark):
    long_words = " ".join(["supercalifragilistic"] * 60)  # mean len 20
    df = spark.createDataFrame([(1, long_words)], "doc_id int, text string")
    # max disabled -> mean-len 20 passes the remaining min-only rule
    r1 = gopher_rules(df, thresholds={"max_mean_word_len": None}).collect()[0]
    assert r1["rule_mean_word_len"] is True
    # min disabled -> the max rule still fails mean-len 20
    r2 = gopher_rules(df, thresholds={"min_mean_word_len": None}).collect()[0]
    assert r2["rule_mean_word_len"] is False
    # both disabled -> rule gone entirely
    flagged = gopher_rules(
        df,
        thresholds={"min_mean_word_len": None, "max_mean_word_len": None},
    )
    assert "rule_mean_word_len" not in flagged.columns


# ---------------------------------------------------------------------------
# Quality gates as first-class expectations
# ---------------------------------------------------------------------------

def test_quality_gate_expectation(spark):
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame(
        [(1, PROSE), (2, "too short"), (3, None), (4, GOOD_PAGE)],
        "doc_id int, text string",
    )
    suite = (
        ExpectationSuite("gates")
        .add(
            "expect_column_values_to_pass_quality_gate",
            column="text", gate="gopher", mostly=0.3,
        )
        .add(
            "expect_column_values_to_pass_quality_gate",
            column="text", gate="c4", min_sentences=4, mostly=0.5,
        )
    )
    res = SuiteValidator().validate(df, suite, result_format="SUMMARY")
    by_gate = {
        r.expectation_config["kwargs"]["gate"]: r for r in res.results
    }
    g = by_gate["gopher"]
    # nulls leave the denominator: 3 considered, PROSE passes
    assert g.result["element_count"] == 4
    assert g.result["unexpected_count"] == 2  # 'too short' + GOOD_PAGE
    assert g.success is True  # 1/3 pass >= mostly 0.3
    c = by_gate["c4"]
    # GOOD_PAGE and PROSE pass c4 at min_sentences=4; 'too short' fails
    assert c.result["unexpected_count"] == 1
    assert c.success is True

    # unknown gate: surfaced as a failed result with the error captured
    # (the planner converts compile errors into exception_info, the
    # reference's catch_exceptions behavior)
    bad = ExpectationSuite("x").add(
        "expect_column_values_to_pass_quality_gate",
        column="text", gate="nope",
    )
    bad_res = SuiteValidator().validate(df, bad)
    assert bad_res.success is False
    assert "gate" in str(bad_res.results[0].to_json_dict()).lower()


def test_language_expectation(spark):
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog every day "
                "because it enjoys running through the quiet meadow."),
            (2, "El perro grande corre por la calle todos los dias con "
                "mucha alegria y despues duerme la siesta en la casa."),
            (3, None),
        ],
        "doc_id int, text string",
    )
    suite = ExpectationSuite("lang").add(
        "expect_column_values_to_be_in_language",
        column="text", languages=["en"], mostly=0.5,
    )
    res = SuiteValidator().validate(df, suite, result_format="SUMMARY")
    r = res.results[0]
    assert r.result["unexpected_count"] == 1  # the Spanish doc
    assert r.success is True  # 1/2 >= 0.5
    # fast classifier path + single language string form
    suite2 = ExpectationSuite("lang2").add(
        "expect_column_values_to_be_in_language",
        column="text", language="es", classifier="fast",
    )
    r2 = SuiteValidator().validate(df, suite2).results[0]
    assert r2.result["unexpected_count"] == 1  # the English doc


def test_quality_gate_grouped_mode(spark):
    """The gate expectations are ordinary map conditions, so they ride
    validate_by_partition's ONE grouped agg — per-partition verdicts
    match per-partition full validation."""
    from great_expectations_spark.checkpoint.runner import (
        validate_by_partition,
    )
    from great_expectations_spark.core.suite import ExpectationSuite
    from great_expectations_spark.plans.planner import SuiteValidator

    df = spark.createDataFrame(
        [
            ("web", PROSE),
            ("web", "too short"),
            ("code", "function f() {} // not prose"),
            ("code", None),
        ],
        "source string, text string",
    )
    suite = ExpectationSuite("g").add(
        "expect_column_values_to_pass_quality_gate",
        column="text", gate="gopher", mostly=0.4,
    )
    grouped = validate_by_partition(df, suite, "source")
    assert set(grouped) == {"web", "code"}
    v = SuiteValidator()
    for part in ("web", "code"):
        full = v.validate(df.filter(F.col("source") == part), suite)
        g = grouped[part].results[0].result
        f = full.results[0].result
        assert g["unexpected_count"] == f["unexpected_count"], part
        assert grouped[part].success == full.success, part
