"""DSIR importance resampling (Xie et al. 2023): hashed-n-gram
importance weights + Gumbel-top-k selection.

Differential oracle: the md5 parity mode is replicated literally in
Python (hashlib md5 over the same normalized words / \\x01-joined
bigrams, same smoothing, same Gumbel construction), so log-weights and
the selected id SET are checked exactly — the same strategy as the C4
literal-Python differential."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.functions import curation


TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox runs over the lazy cat"),
    (2, "a quick brown dog jumps over a lazy fox"),
]
RAW = [
    (10, "the quick brown fox jumps over the lazy dog today"),
    (11, "stock market prices fell sharply in heavy trading"),
    (12, "quick brown foxes jump over lazy dogs every day"),
    (13, "the committee approved the budget after long debate"),
    (14, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (15, "a lazy dog and a quick fox play in the park"),
    (16, ""),
    (17, None),
    # whitespace edges: leading \n survives Spark's space-only trim and
    # normalizes to a leading ''-token — the replica must match that,
    # not Python str.strip()'s unicode-whitespace semantics
    (18, "\nthe quick fox\tjumps again"),
    (19, "   "),
]


def _norm_words(t: str) -> list:
    """EXACT replica of Spark normalize_text + split: trim strips
    ASCII SPACES only (not \\n/\\t), Java \\s is the ASCII class."""
    import re

    return re.sub(
        "[ \t\n\x0b\f\r]+", " ", t.strip(" ").lower()
    ).split(" ")


def _md5_bucket_py(key: str, n: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n + 1


def _features_py(t, n_buckets: int, bigrams: bool = True) -> list:
    if t is None or not t.strip(" "):
        return []
    ws = _norm_words(t)
    ids = [_md5_bucket_py(w, n_buckets) for w in ws]
    if bigrams:
        ids += [
            _md5_bucket_py(ws[i - 1] + "\x01" + ws[i], n_buckets)
            for i in range(1, len(ws))
        ]
    return ids


def _train_py(target, raw, n_buckets: int, alpha: float = 1.0) -> list:
    tc, rc = [0] * n_buckets, [0] * n_buckets
    for _, t in target:
        for b in _features_py(t, n_buckets):
            tc[b - 1] += 1
    for _, t in raw:
        for b in _features_py(t, n_buckets):
            rc[b - 1] += 1
    tt, rt = sum(tc), sum(rc)
    td, rd = tt + alpha * n_buckets, rt + alpha * n_buckets
    return [
        math.log((tc[b] + alpha) / td) - math.log((rc[b] + alpha) / rd)
        for b in range(n_buckets)
    ]


def _logw_py(t, ratio, n_buckets: int):
    ids = _features_py(t, n_buckets)
    if not ids:
        return None
    return sum(ratio[b - 1] for b in ids)


def _gumbel_py(doc_id: int, seed: str) -> float:
    u = (
        int(hashlib.md5(f"{doc_id}{seed}".encode()).hexdigest()[:8], 16)
        + 0.5
    ) / 2**32
    return -math.log(-math.log(u))


N_BUCKETS = 64


@pytest.fixture(scope="module")
def model(spark):
    tdf = spark.createDataFrame(TARGET, "doc_id long, text string")
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    return curation.train_dsir(
        tdf, rdf, n_buckets=N_BUCKETS, hash_function="md5"
    )


def test_train_matches_python_replica(model):
    expected = _train_py(TARGET, RAW, N_BUCKETS)
    assert model["n_buckets"] == N_BUCKETS
    assert model["target_tokens"] == sum(
        len(_features_py(t, N_BUCKETS)) for _, t in TARGET
    )
    for got, want in zip(model["log_ratio"], expected):
        assert got == pytest.approx(want, abs=1e-12)


def test_logweight_matches_python_replica(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    ratio = _train_py(TARGET, RAW, N_BUCKETS)
    rows = rdf.select(
        "doc_id",
        curation.dsir_logweight(F.col("text"), model).alias("lw"),
    ).collect()
    for r in rows:
        want = _logw_py(dict(RAW)[r["doc_id"]], ratio, N_BUCKETS)
        if want is None:
            assert r["lw"] is None
        else:
            assert r["lw"] == pytest.approx(want, rel=1e-12)


def test_target_like_docs_outweigh_off_target(spark):
    """Docs sharing the target's vocabulary must carry higher importance
    weight than off-distribution docs — the point of DSIR.  (Needs a
    bucket count large enough that hash collisions don't smear the two
    vocabularies together; the 64-bucket parity model above is too
    small for a semantic assertion.)"""
    tdf = spark.createDataFrame(TARGET, "doc_id long, text string")
    rdf = spark.createDataFrame(RAW[:6], "doc_id long, text string")
    m = curation.train_dsir(
        tdf, rdf, n_buckets=1 << 12, hash_function="md5"
    )
    lw = {
        r["doc_id"]: r["lw"]
        for r in rdf.select(
            "doc_id",
            curation.dsir_logweight(F.col("text"), m).alias("lw"),
        ).collect()
    }
    on_target = [lw[10], lw[12], lw[15]]
    off_target = [lw[11], lw[13], lw[14]]
    assert min(on_target) > max(off_target)


def test_xxhash_default_agrees_on_ranking(spark):
    """The fast xxhash64 mode can't be replicated off-JVM, but its
    RANKING must agree with the md5 mode on clearly separated docs."""
    tdf = spark.createDataFrame(TARGET, "doc_id long, text string")
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    m = curation.train_dsir(tdf, rdf, n_buckets=1 << 12)
    assert m["hash_function"] == "xxhash64"
    lw = {
        r["doc_id"]: r["lw"]
        for r in rdf.select(
            "doc_id",
            curation.dsir_logweight(F.col("text"), m).alias("lw"),
        ).collect()
    }
    assert min(lw[10], lw[12], lw[15]) > max(lw[11], lw[13], lw[14])
    assert lw[16] is None and lw[17] is None


def test_gumbel_topk_matches_python_replica(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    got = curation.dsir_sample(
        rdf, model, k=3, seed="s9", weight_column="logw"
    )
    assert set(got.columns) == {"doc_id", "text", "logw"}
    got_ids = {r["doc_id"] for r in got.collect()}

    ratio = _train_py(TARGET, RAW, N_BUCKETS)
    keyed = []
    for did, t in RAW:
        lw = _logw_py(t, ratio, N_BUCKETS)
        if lw is None:
            continue
        keyed.append((lw + _gumbel_py(did, "s9"), -did))
    keyed.sort(reverse=True)
    want_ids = {-d for _, d in keyed[:3]}
    assert got_ids == want_ids


def test_sample_is_seed_deterministic_and_seed_sensitive(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    a = {r["doc_id"] for r in curation.dsir_sample(rdf, model, k=3,
                                                   seed="a").collect()}
    b = {r["doc_id"] for r in curation.dsir_sample(rdf, model, k=3,
                                                   seed="a").collect()}
    assert a == b
    seeds = [
        frozenset(
            r["doc_id"]
            for r in curation.dsir_sample(rdf, model, k=3,
                                          seed=f"s{i}").collect()
        )
        for i in range(8)
    ]
    assert len(set(seeds)) > 1  # the Gumbel draw actually varies


def test_fraction_mode_keeps_highest_weight_tail(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    kept = curation.dsir_sample(
        rdf, model, fraction=0.5, seed="f", weight_column="logw"
    ).collect()
    assert 2 <= len(kept) <= 5  # 7 scoreable docs, sketch-approximate
    # every kept doc's key clears every dropped doc's key
    ratio = _train_py(TARGET, RAW, N_BUCKETS)
    key = {
        did: _logw_py(t, ratio, N_BUCKETS) + _gumbel_py(did, "f")
        for did, t in RAW
        if _logw_py(t, ratio, N_BUCKETS) is not None
    }
    kept_ids = {r["doc_id"] for r in kept}
    dropped = set(key) - kept_ids
    assert min(key[i] for i in kept_ids) >= max(
        key[i] for i in dropped
    )


def test_scoring_plan_is_jvm_only_no_shuffle(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    scored = rdf.select(
        curation.dsir_logweight(F.col("text"), model).alias("lw")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_model_roundtrip_and_validation(spark, model, tmp_path):
    path = str(tmp_path / "dsir.json")
    curation.model_save(spark, model, path)
    loaded = curation.model_load(spark, path)
    assert loaded["log_ratio"] == pytest.approx(model["log_ratio"])
    tdf = spark.createDataFrame(TARGET, "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha"):
        curation.train_dsir(tdf, tdf, n_buckets=8, alpha=0.0)
    with pytest.raises(ValueError, match="hash_function"):
        curation.train_dsir(tdf, tdf, n_buckets=8, hash_function="sha1")
    with pytest.raises(ValueError, match="exactly one"):
        curation.dsir_sample(tdf, model)
    with pytest.raises(ValueError, match="fraction"):
        curation.dsir_sample(tdf, model, fraction=1.5)


def test_curate_corpus_dsir_stage(spark, model):
    rdf = spark.createDataFrame(RAW, "doc_id long, text string")
    out, report = curation.curate_corpus(
        rdf, dsir_model=model, dsir_keep=3, seed="s9", with_report=True
    )
    assert out.count() == 3
    assert [r["stage"] for r in report] == ["input", "dsir"]
    with pytest.raises(ValueError, match="dsir_keep"):
        curation.curate_corpus(rdf, dsir_model=model)


def test_fraction_mode_empty_corpus(spark, model):
    empty = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    assert curation.dsir_sample(empty, model, fraction=0.5).count() == 0


def test_curate_corpus_dsir_and_mixture_seeds_are_independent(spark):
    """Regression: dsir_sample's Gumbel draw and mix_sample's keep-draw
    both hash md5(id || seed); with the same seed the mixture stage
    systematically drops DSIR survivors (a 0.2-weight group kept ZERO
    docs).  curate_corpus must domain-separate the two stage seeds."""
    rows = [(i, f"alpha w{i % 7} beta", "a") for i in range(0, 200)]
    rows += [(i, f"alpha w{i % 7} beta", "b") for i in range(200, 400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    m = curation.train_dsir(df, df, n_buckets=64, hash_function="md5")
    out, _ = curation.curate_corpus(
        df,
        dsir_model=m, dsir_keep=200,
        mixture_column="source", mixture_weights={"a": 0.8, "b": 0.2},
        seed="x",
    )
    n_b = out.filter(F.col("source") == "b").count()
    # flat model => DSIR keeps ~100 per source; the 0.2-weight group's
    # mixture keep-rate is ~0.25 of its survivors => ~25 expected, and
    # ANY correlation collapse shows up as 0
    assert n_b >= 10


def test_dsir_scoring_composes_with_structured_streaming(spark, tmp_path, model):
    """dsir_logweight is a stateless projection, so streaming corpora
    can be scored (and threshold-filtered) with readStream unchanged —
    the streaming arm of the curation pipeline.  (Gumbel-top-k is a
    global sort and stays batch-side by design.)"""
    src = str(tmp_path / "dsir_src")
    spark.createDataFrame(
        RAW[:4], "doc_id long, text string"
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    scored = stream.select(
        "doc_id", curation.dsir_logweight(F.col("text"), model).alias("lw")
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("gx_dsir_stream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: r["lw"]
        for r in spark.sql("SELECT * FROM gx_dsir_stream").collect()
    }
    ratio = _train_py(TARGET, RAW, N_BUCKETS)
    for did, t in RAW[:4]:
        assert got[did] == pytest.approx(
            _logw_py(t, ratio, N_BUCKETS), rel=1e-12
        )
