"""Text / dedup / similarity / multimodal / splitter / streaming tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.functions import dedup, multimodal, similarity
from great_expectations_spark.functions import text as gxtext
from great_expectations_spark.sources import splitters
from great_expectations_spark.streaming.validate_stream import (
    streaming_quarantine,
    validate_each_microbatch,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "THE  Quick  Brown Fox jumps over the lazy dog"),  # dup of 0
        (3, "el rapido zorro marron salta sobre el perro"),
        (4, "completely different content about spark engines"),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark, docs):
    out = docs.select(
        "doc_id", gxtext.token_count(F.col("text")).alias("n")
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    assert got[0] == 9
    assert got[5] == 0
    assert got[6] is None


def test_language_id_fast(spark, docs):
    out = docs.select(
        "doc_id", gxtext.language_id_fast(F.col("text")).alias("lang")
    ).collect()
    got = {r["doc_id"]: r["lang"] for r in out}
    assert got[0] == "en"
    assert got[3] == "es"
    assert got[6] == "und"


def test_language_id_dispatches_to_cavnar_trenkle(spark):
    # the documented public name must return classifier quality: check it
    # against held-out sentences (never used for profile building)
    from great_expectations_spark.functions import langid

    rows = [
        (lang, langid.HELDOUT_SENTENCES[lang][0])
        for lang in ("en", "de", "fr", "pt")
    ] + [("und", None)]
    df = spark.createDataFrame(rows, "true_lang string, text string")
    out = df.select(
        "true_lang", gxtext.language_id(F.col("text")).alias("pred")
    ).collect()
    assert all(r["pred"] == r["true_lang"] for r in out)


def test_quality_and_fingerprint(spark, docs):
    out = docs.select(
        "doc_id",
        gxtext.quality_score(F.col("text")).alias("q"),
        gxtext.fingerprint64(F.col("text")).alias("fp"),
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert 0 <= got[0]["q"] <= 1
    assert got[5]["q"] == 0.0
    # normalization: doc 2 is doc 0 with different case/whitespace
    assert got[0]["fp"] == got[2]["fp"]


def test_exact_dedup(spark, docs):
    stats = dedup.exact_duplicate_stats(docs).first()
    assert stats["n_rows"] == 6  # null text excluded
    assert stats["n_duplicate_rows"] == 2  # docs 0 and 2
    kept = dedup.exact_dedup(docs, "text", order_by="doc_id")
    assert kept.count() == 6  # 7 rows - 1 dup (null kept)
    assert kept.filter("doc_id = 2").count() == 0  # doc 0 wins


def test_minhash_pairs(spark, docs):
    pairs = dedup.minhash_candidate_pairs(
        docs, "doc_id", "text", shingle_k=2, num_hashes=32, bands=16,
        verify_threshold=0.5,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 2) in got  # exact dup found
    assert (0, 1) in got  # near dup (one word differs)
    assert all(a != 4 and b != 4 for a, b in got)


def test_simhash_pairs(spark, docs):
    # token features (shingle_k=1): one changed word out of nine keeps the
    # fingerprints within a few bits
    pairs = dedup.simhash_candidate_pairs(
        docs.filter("text is not null"), "doc_id", "text", max_hamming=8,
        shingle_k=1,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((0, 2)) == 0  # identical after normalization
    assert (0, 1) in got
    # shingle features (default): exact dup still at hamming 0
    sh = dedup.simhash_candidate_pairs(
        docs.filter("text is not null"), "doc_id", "text", max_hamming=0
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in sh} == {(0, 2)}


def test_simhash_banding_combinations(spark, docs):
    # wider-key banding (n_blocks > max_hamming + 1) must find the same
    # pairs — the pigeonhole guarantee holds for any n_blocks > H
    base = dedup.simhash_candidate_pairs(
        docs.filter("text is not null"), "doc_id", "text", max_hamming=8,
        shingle_k=1,
    ).collect()
    wide = dedup.simhash_candidate_pairs(
        docs.filter("text is not null"), "doc_id", "text", max_hamming=8,
        shingle_k=1, n_blocks=12,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in base} == {
        (r["id_a"], r["id_b"]) for r in wide
    }
    with pytest.raises(ValueError, match="must exceed"):
        dedup.simhash_candidate_pairs(
            docs, "doc_id", "text", max_hamming=4, n_blocks=4
        )


def test_ngram_jaccard_df_cap(spark):
    # a corpus-common ("hot") shingle must not explode the pair count:
    # with the doc-frequency cap the shared boilerplate shingle is dropped
    # before the join, so unrelated docs produce NO candidate rows at all
    boiler = "all rights reserved worldwide"
    rows = [(i, f"document {i} unique body text {i} " + boiler) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=4, threshold=0.0, max_doc_frequency=10
    )
    uncapped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=4, threshold=0.0, max_doc_frequency=None
    )
    assert uncapped.count() == 40 * 39 // 2  # hot shingle went quadratic
    assert capped.count() == 0  # bounded: hot shingle dropped pre-join


def test_lsh_topk_multiprobe_recall(spark):
    # probes must cover ALL buckets within max_hamming bits (not just 1):
    # with max_hamming = n_bits every vector is a candidate, so the
    # result must equal exact brute force
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = rows[0][1]
    exact = similarity.brute_force_topk(emb, query, 5).collect()
    full_probe = similarity.lsh_topk(
        emb, query, k=5, n_bits=6, max_hamming=6
    ).collect()
    assert [r["vec_id"] for r in full_probe] == [r["vec_id"] for r in exact]
    # probe-set size is sum_{h<=H} C(n_bits, h)
    assert len(similarity.probe_signatures(0, 8, 2)) == 1 + 8 + 28


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=2, threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(0, 2)] == pytest.approx(1.0)
    assert 0.5 <= got[(0, 1)] < 1.0


def test_cosine_and_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = similarity.brute_force_topk(emb, [1.0, 0.0, 0.0], 2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    assert top[0]["cos_sim"] == pytest.approx(1.0)

    near = similarity.embedding_near_dup_pairs(
        emb, threshold=0.9, n_bits=6
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in near} == {(0, 1)}


def test_lsh_topk_matches_bruteforce_top1(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [float(x) for x in vecs[17]]
    exact = similarity.brute_force_topk(emb, query, 1).first()
    approx = similarity.lsh_topk(
        emb, query, k=1, n_bits=8, max_hamming=1
    ).first()
    assert exact["vec_id"] == 17
    assert approx is not None and approx["vec_id"] == 17


def test_multimodal_plumbing(spark):
    rows = [(1, b"\x00\x01imagebytes"), (2, b"\xff\xfe"), (3, None)]
    df = spark.createDataFrame(rows, "id long, data binary")
    out = multimodal.image_features(df).collect()
    got = {r["id"]: r for r in out}
    assert len(got[1]["features"]) == multimodal.IMAGE_FEATURE_DIM
    assert got[1]["n_bytes"] == 12
    assert got[3]["n_bytes"] == 0
    # deterministic across partitioning
    out2 = multimodal.image_features(df.repartition(3)).collect()
    assert {r["id"]: tuple(r["features"]) for r in out2} == {
        r["id"]: tuple(r["features"]) for r in out
    }
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.image_features(df, deterministic_fake=False).collect()


def test_audio_decode_closed_forms():
    """Pure-tone signal math pins every feature slot: a sine of
    amplitude A at f Hz has rms A/sqrt(2), zcr 2f/sr, spectral centroid
    f/Nyquist, and all band mass in f's band."""
    import numpy as np

    sr, f, amp = 16000, 1000.0, 0.5
    t = np.arange(sr) / sr  # exactly 1 s, integer number of cycles
    wav = multimodal.encode_wav(amp * np.sin(2 * np.pi * f * t), sr)
    samples, rate = multimodal.decode_audio(wav)
    assert rate == sr and len(samples) == sr
    vec = multimodal.audio_feature_vec(samples, rate)
    assert len(vec) == multimodal.AUDIO_FEATURE_DIM
    dur, rms, zcr, centroid = vec[:4]
    assert dur == pytest.approx(1.0)
    assert rms == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert zcr == pytest.approx(2 * f / sr, rel=1e-2)
    assert centroid == pytest.approx(f / (sr / 2), rel=1e-3)
    bands = np.array(vec[4:])
    assert bands.sum() == pytest.approx(1.0, abs=1e-6)
    # all tonal mass in one band; a higher tone lands in a later band
    assert bands.max() > 0.99
    hi = multimodal.audio_feature_vec(
        multimodal.decode_audio(
            multimodal.encode_wav(np.sin(2 * np.pi * 6000.0 * t), sr)
        )[0],
        sr,
    )
    assert np.argmax(hi[4:]) > np.argmax(bands)
    assert hi[3] > centroid  # centroid ordering follows pitch


def test_audio_roundtrip_property():
    """encode_wav -> decode_audio is the exact identity on int16 PCM
    (scaled by 1/32768), for arbitrary lengths/rates incl. empty."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=40, deadline=None)
    @given(
        samples=arrays(
            np.int16, st.integers(min_value=0, max_value=400)
        ),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
    )
    def check(samples, rate):
        out, got_rate = multimodal.decode_audio(
            multimodal.encode_wav(samples, rate)
        )
        assert got_rate == rate
        np.testing.assert_array_equal(
            out, samples.astype(np.float64) / 32768.0
        )

    check()


def test_audio_stereo_downmix_and_errors():
    import io
    import wave

    import numpy as np

    sr = 8000
    t = np.arange(sr // 2) / sr
    left = (0.25 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    right = np.zeros_like(left)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            np.column_stack([left, right]).ravel().tobytes()
        )
    samples, rate = multimodal.decode_audio(buf.getvalue())
    # stereo averaged to mono halves the amplitude
    assert rate == sr
    assert np.abs(samples).max() == pytest.approx(0.125, rel=1e-2)
    with pytest.raises(NotImplementedError, match="non-WAV"):
        multimodal.decode_audio(b"ID3\x04mp3-ish bytes")


def test_audio_features_dataframe(spark):
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    rows = [
        (1, multimodal.encode_wav(0.5 * np.sin(2 * np.pi * 500 * t), sr)),
        (2, multimodal.encode_wav(0.5 * np.sin(2 * np.pi * 3000 * t), sr)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, data binary")
    out = {r["id"]: r for r in multimodal.audio_features(df).collect()}
    assert out[1]["duration_ms"] == 1000
    assert len(out[1]["features"]) == multimodal.AUDIO_FEATURE_DIM
    assert out[2]["features"][3] > out[1]["features"][3]  # centroid order
    assert out[3]["features"] is None and out[3]["n_bytes"] == 0
    # deterministic across partitioning (real decode path)
    again = {
        r["id"]: r for r in multimodal.audio_features(df.repartition(3)).collect()
    }
    assert {k: tuple(v["features"]) if v["features"] else None for k, v in again.items()} == {
        k: tuple(v["features"]) if v["features"] else None for k, v in out.items()
    }


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3500)], "id long, duration_ms int")
    frames = multimodal.frame_sample_plan(df, "duration_ms", 1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_splitters_and_samplers(spark):
    events = spark.range(100).select(
        F.col("id"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad((F.col("id") % 28) + 1, 2, "0"))
        ).alias("ts"),
    )
    jan5 = splitters.split_on_date_parts(
        events, "ts", {"ts": {"year": 2024, "month": 1, "day": 5}},
        ["year", "month", "day"],
    )
    assert jan5.count() == events.filter(F.dayofmonth("ts") == 5).count()
    mod = splitters.split_on_mod_integer(events, "id", 10, {"id": 3})
    assert mod.count() == 10
    buckets = sum(
        splitters.split_on_salted_bucket(events, "id", 4, b).count()
        for b in range(4)
    )
    assert buckets == 100
    assert splitters.sample_using_limit(events, 7).count() == 7
    assert splitters.sample_using_mod(events, "id", 4, 1).count() == 25


def test_streaming_quarantine_and_microbatch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "zz")],
        "id long, cat string",
    ).write.parquet(src)
    suite = (
        ExpectationSuite("s")
        .add("expect_column_values_to_not_be_null", column="cat")
        .add(
            "expect_column_values_to_be_in_set",
            column="cat",
            value_set=["a", "b"],
        )
    )
    stream = spark.readStream.schema("id long, cat string").parquet(src)
    flagged = streaming_quarantine(stream, suite)
    q = (
        flagged.writeStream.format("memory")
        .queryName("gx_quarantine")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT id, __gx_unexpected FROM gx_quarantine ORDER BY id"
    ).collect()
    assert [r["__gx_unexpected"] for r in rows] == [False, True, False, True]

    seen = {}
    q2 = validate_each_microbatch(
        stream,
        suite,
        on_result=lambda epoch, res: seen.setdefault(epoch, res),
        trigger_once=True,
        checkpoint_location=str(tmp_path / "ckpt_stream"),
    )
    q2.awaitTermination(60)
    assert seen
    res = next(iter(seen.values()))
    assert res.statistics["evaluated_expectations"] == 2
    assert not res.success


def test_ppm_decode_real(spark):
    """REAL image decode path: PPM bytes -> numpy -> 16-dim grid feature,
    end-to-end through mapInPandas — no external image libs."""
    import numpy as np

    # 8x8 image: left half black, right half white
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 255
    data = multimodal.encode_ppm(img)
    # local decode round-trip
    back = multimodal.decode_image(data)
    assert back.shape == (8, 8, 3)
    assert np.array_equal(back, img)
    feats = multimodal.image_feature_vec(back)
    assert len(feats) == 16
    # 4x4 grid: columns 0-1 black (0.0), columns 2-3 white (1.0)
    grid = np.array(feats).reshape(4, 4)
    assert np.allclose(grid[:, :2], 0.0) and np.allclose(grid[:, 2:], 1.0)

    # through Spark
    df = spark.createDataFrame([(1, bytearray(data))], "id long, data binary")
    out = multimodal.image_features(df, deterministic_fake=False).collect()
    assert list(out[0]["features"]) == pytest.approx(feats)


def test_pgm_grayscale_and_comments():
    import numpy as np

    body = bytes(range(16))
    data = b"P5\n# a comment\n4 4\n255\n" + body
    img = multimodal.decode_image(data)
    assert img.shape == (4, 4, 1)
    assert img.ravel().tolist() == list(range(16))


def test_non_netpbm_requires_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_ivf_ann(spark):
    """IVF coarse-quantizer ANN: full-probe search equals exact brute
    force; probe-limited search still finds the self-match and touches
    only the probed inverted lists."""
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 12))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids = similarity.ivf_index(emb, n_clusters=8, seed=3)
    assert centroids.shape == (8, 12)
    assert assigned.select("__ivf_cluster").distinct().count() <= 8

    query = [float(x) for x in vecs[42]]
    exact = similarity.brute_force_topk(emb, query, 5).collect()
    # n_probe = n_clusters degrades to exact search
    full = similarity.ivf_topk(
        assigned, centroids, query, k=5, n_probe=8
    ).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]
    # a 2-probe search still finds the query's own vector (cos=1 in its
    # own cluster, which is always the nearest centroid)
    near = similarity.ivf_topk(
        assigned, centroids, query, k=1, n_probe=2
    ).first()
    assert near["vec_id"] == 42


def test_ivfpq_adc_identity_and_exactness(spark):
    """IVF-PQ: (a) the JVM ADC expression computes EXACTLY
    q̂·(centroid + decode(code)) — pinned against a from-scratch numpy
    reconstruction of the same codes; (b) with full probes and a refine
    set covering the table, the re-ranked result EQUALS brute force;
    (c) encoding is deterministic under seed."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((240, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    encoded, centroids, codebooks = similarity.ivfpq_index(
        emb, n_clusters=6, m=4, seed=5
    )
    assert centroids.shape == (6, 16)
    assert codebooks.shape == (4, 256, 4)
    pdf = encoded.select("vec_id", "__ivf_cluster", "__pq_code").toPandas()
    assert pdf["__pq_code"].map(len).eq(4).all()

    # (c) determinism
    encoded2, cents2, cbs2 = similarity.ivfpq_index(
        emb, n_clusters=6, m=4, seed=5
    )
    assert np.array_equal(cents2, centroids)
    assert np.array_equal(cbs2, codebooks)
    pdf2 = encoded2.select("vec_id", "__pq_code").toPandas()
    merged = pdf.merge(pdf2, on="vec_id", suffixes=("", "_b"))
    assert all(
        list(a) == list(b)
        for a, b in zip(merged["__pq_code"], merged["__pq_code_b"])
    )

    # (a) ADC identity: JVM score == numpy q̂·(centroid + decoded residual)
    query = [float(x) for x in vecs[17]]
    q = np.asarray(query)
    qhat = q / np.linalg.norm(q)
    m, n_codes, dsub = codebooks.shape
    lut = np.stack(
        [codebooks[j] @ qhat[j * dsub : (j + 1) * dsub] for j in range(m)]
    )
    cterm = centroids @ qhat
    lut_flat = [float(x) for x in lut.reshape(-1)]
    adc = (
        F.element_at(F.lit([float(x) for x in cterm]),
                     F.col("__ivf_cluster") + 1)
        + F.aggregate(
            F.zip_with(
                F.col("__pq_code").cast("array<int>"),
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda c, j: F.element_at(
                    F.lit(lut_flat), j * n_codes + c + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    ).alias("score")
    got = {
        r["vec_id"]: r["score"]
        for r in encoded.select("vec_id", adc).collect()
    }
    for _, row in pdf.iterrows():
        decoded = centroids[row["__ivf_cluster"]].astype(np.float64).copy()
        for j, c in enumerate(row["__pq_code"]):
            decoded[j * dsub : (j + 1) * dsub] += codebooks[j][c]
        expect = float(qhat @ decoded)
        assert abs(got[row["vec_id"]] - expect) < 1e-5, row["vec_id"]

    # (b) full probes + refine covering all rows == exact brute force
    exact = similarity.brute_force_topk(emb, query, 5).collect()
    full = similarity.ivfpq_topk(
        encoded, centroids, codebooks, query,
        k=5, n_probe=6, refine_factor=48,
    ).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]
    assert [r["cos_sim"] for r in full] == [r["cos_sim"] for r in exact]

    # probe-limited, modest refine: self-match still #1
    near = similarity.ivfpq_topk(
        encoded, centroids, codebooks, query, k=1, n_probe=2,
        refine_factor=4,
    ).first()
    assert near["vec_id"] == 17


def test_ivfpq_write_load_partition_pruning(spark, tmp_path):
    """Persisted IVF-PQ index: (a) load-back search equals the in-memory
    index exactly; (b) the probe scan PARTITION-PRUNES — the parquet
    read's PartitionFilters carry the IN(probes) predicate, so untouched
    inverted lists are never opened."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    encoded, cents, cbs = similarity.ivfpq_index(
        emb, n_clusters=5, m=2, seed=9
    )
    query = [float(x) for x in vecs[3]]
    mem = similarity.ivfpq_topk(
        encoded, cents, cbs, query, k=5, n_probe=3, refine_factor=8
    ).collect()

    root = str(tmp_path / "ivfpq")
    similarity.ivfpq_write(encoded, cents, cbs, root)
    enc2, cents2, cbs2 = similarity.ivfpq_load(spark, root)
    assert np.allclose(cents2, cents) and np.allclose(cbs2, cbs)
    disk = similarity.ivfpq_topk(
        enc2, cents2, cbs2, query, k=5, n_probe=3, refine_factor=8
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in disk] == [
        (r["vec_id"], r["cos_sim"]) for r in mem
    ]

    # partition pruning: the ADC scan's parquet read prunes by cluster
    from pyspark.sql import functions as F

    qhat = np.asarray(query) / np.linalg.norm(query)
    probes = [int(i) for i in np.argsort(-(cents2 @ qhat))[:3]]
    scan = enc2.filter(F.col("__ivf_cluster").isin(probes)).select(
        "vec_id", "__pq_code"
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "__ivf_cluster" in pf  # predicate reached the partition level


# --- Cavnar–Trenkle language ID ------------------------------------------


def test_langid_ct_heldout_accuracy():
    """>=95% on the held-out fixture (never used for profiles); joined
    two-sentence docs must be perfect."""
    from great_expectations_spark.functions.langid import (
        HELDOUT_SENTENCES,
        classify,
    )

    total = correct = 0
    for lang, sents in HELDOUT_SENTENCES.items():
        for s in sents:
            total += 1
            correct += classify(s) == lang
        assert classify(" ".join(sents)) == lang, lang
    assert correct / total >= 0.95, f"{correct}/{total}"


def test_langid_ct_confusable_pairs():
    """The classically confusable pairs must separate on the fixture:
    es/pt (Iberian Romance), da/no (continental Scandinavian), sv/da,
    cs/pl (Latin-script Slavic), es/ca."""
    from great_expectations_spark.functions.langid import (
        HELDOUT_SENTENCES,
        classify,
    )

    for a, b in [("es", "pt"), ("da", "no"), ("sv", "da"), ("cs", "pl"),
                 ("es", "ca")]:
        for lang in (a, b):
            doc = " ".join(HELDOUT_SENTENCES[lang])
            assert classify(doc) == lang, (a, b, lang)


def test_langid_ct_und_and_nonlinguistic():
    from great_expectations_spark.functions.langid import classify

    assert classify(None) == "und"
    assert classify("") == "und"
    assert classify("12345 678 90 ...!!!") == "und"


def test_langid_ct_udf_matches_python(spark):
    """The Arrow UDF path must agree with the plain-Python classifier."""
    from great_expectations_spark.functions.langid import (
        HELDOUT_SENTENCES,
        classify,
        language_id_ct,
    )
    from pyspark.sql import functions as F

    rows = [
        (lang, s)
        for lang, sents in sorted(HELDOUT_SENTENCES.items())
        for s in sents
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = df.select(
        "lang", "text", language_id_ct(F.col("text")).alias("pred")
    ).collect()
    for r in got:
        assert r["pred"] == classify(r["text"]), r["lang"]


def test_langid_vectorized_matches_scalar():
    """classify_np (packed-key numpy path, what the UDF runs) must be
    bit-identical to the scalar reference — incl. empty/None input,
    non-linguistic text, astral-plane letters, and rank ties."""
    from great_expectations_spark.functions.langid import (
        HELDOUT_SENTENCES,
        classify,
        classify_np,
    )

    cases = [
        None,
        "",
        "12345 678 90 ...!!!",
        "a",
        " x  y ",
        "é ü ñ č ß",
        "ΑΒΓ αβγ δίκαιο",
        "русский текст тут",
        "mix123ed te!xt &*()",
        "\U00010330\U00010331 gothic letters",
        "\U00020000\U00020001 cjk ext b",
        "İstanbul DİYOR",  # lower() changes length (İ -> i + U+0307)
        "aa bb aa cc bb aa",  # forced count ties across grams
    ]
    for lang, sents in HELDOUT_SENTENCES.items():
        cases.extend(sents)
        cases.append(" ".join(sents))
    for t in cases:
        assert classify_np(t) == classify(t), repr(t)


def test_langid_ct_deterministic_rank_tiebreak():
    """Rank ordering must be (count desc, gram asc) — the documented
    deterministic tie-break."""
    from collections import Counter

    from great_expectations_spark.functions.langid import _rank

    grams = Counter({"b": 2, "a": 2, "c": 3})
    ranked = _rank(grams, 10)
    assert ranked == {"c": 0, "a": 1, "b": 2}


def test_simhash_arrow_jvm_agree_on_unicode_whitespace(spark):
    """The one-pass Arrow signature must tokenize exactly like the JVM
    normalize path — including NBSP and other Unicode spaces, which
    Java regex \\s does NOT treat as whitespace."""
    from great_expectations_spark.functions import dedup

    texts = [
        ("a", "foo bar baz qux"),       # NBSP inside a token (JVM keeps)
        ("b", "foo bar baz qux"),
        ("c", " foo\tbar\nbaz qux "),        # ASCII ws variants
        ("d", "x y z w"),               # unicode line sep
    ]
    df = spark.createDataFrame(texts, "id string, text string")
    jvm = {
        r["id"]: r["s"]
        for r in df.select(
            "id", dedup.simhash64(F.col("text"), shingle_k=2).alias("s")
        ).collect()
    }
    arrow_sig = dedup._text_to_simhash_arrow(shingle_k=2)
    arrow = {
        r["id"]: r["s"]
        for r in df.select("id", arrow_sig(F.col("text")).alias("s")).collect()
    }
    assert jvm == arrow
    # and the NBSP text must NOT hash like the plain-space text
    assert jvm["a"] != jvm["b"]


# --------------------------------------------------------------------------
# connected components / cluster dedup
# --------------------------------------------------------------------------


def _bfs_components(edges):
    """Driver-side ground truth: min-id component label per node."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label, seen = {}, set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        root = min(comp)
        for n in comp:
            label[n] = root
    return label


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_connected_components_chain_clique_singleton(spark, driver_threshold):
    """A 6-chain (worst case for label propagation), a clique, a 2-cycle
    and duplicate/reversed edges must all resolve to min-id labels —
    identically on the driver union-find AND distributed star paths."""
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),      # chain
        (10, 11), (11, 12), (10, 12),                # triangle
        (20, 21), (21, 20), (20, 21),                # dup + reversed
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            pairs, driver_threshold=driver_threshold
        ).collect()
    }
    assert got == _bfs_components(edges)


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_connected_components_random_graph_matches_bfs(
    spark, driver_threshold
):
    """Differential: 300 random edges over 120 nodes vs driver BFS, on
    both execution paths."""
    import random

    rng = random.Random(42)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(
            pairs, driver_threshold=driver_threshold
        ).collect()
    }
    assert got == _bfs_components(edges)


def test_connected_components_empty_and_self_loops(spark):
    pairs = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0
    empty = pairs.filter("id_a < 0")
    out = dedup.connected_components(empty)
    assert out.count() == 0 and out.columns == ["id", "component"]


def test_connected_components_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_near_dedup_keeps_cluster_minimum_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "id_a long, id_b long"
    )
    survivors = sorted(
        r["doc_id"]
        for r in dedup.near_dedup(docs, "doc_id", pairs).collect()
    )
    # cluster {1,2,5} -> keep 1; cluster {6,7} -> keep 6; 0,3,4 singletons
    assert survivors == [0, 1, 3, 4, 6]
    clusters = {
        r["component"]: r["size"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert clusters == {1: 3, 6: 2}


def test_dedup_corpus_one_call(spark):
    """dedup_corpus chains pairs -> components -> survivors; the ngram
    method must keep exactly one doc per near-dup cluster (min id) and
    every distinct doc."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight!"),
        (5, "the quick brown fox jumps over the lazy dog  tonight"),
        (3, "completely different text about spark execution plans"),
        (4, "another unrelated document mentioning window functions"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = sorted(
        r["doc_id"]
        for r in dedup.dedup_corpus(
            docs, "doc_id", "text", method="ngram", threshold=0.5
        ).collect()
    )
    assert survivors == [1, 3, 4]
    assert dedup.dedup_corpus(docs, "doc_id", method="exact").count() == 4
    with pytest.raises(ValueError, match="unknown dedup method"):
        dedup.dedup_corpus(docs, "doc_id", method="bogus")


def test_ngram_pairs_arrow_jvm_engines_agree(spark):
    """The Arrow shingle path must produce the IDENTICAL pair set and
    Jaccard values as the JVM expression path (hash family differs, but
    hashes only join against themselves), including unicode whitespace
    and short-text whole-doc shingles."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the Quick  brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox leaps over the lazy dog tonight"),
        (4, "short text"),
        (5, "short text"),
        (6, "totally unrelated words in this one document here"),
        (7, "foo bar baz qux quux corge grault garply waldo"),
        (8, "foo bar baz qux quux corge grault garply waldo"),
        (9, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for eng in ("arrow", "jvm"):
        out[eng] = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", k=3, threshold=0.3,
                shingle_engine=eng,
            ).collect()
        )
    assert out["arrow"] == out["jvm"] and len(out["arrow"]) >= 3


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition signals vs hand-computed values."""
    import math

    doc1 = "spam spam spam spam"          # one word repeated
    doc2 = "a b\na b\nc d"                # one duplicated line
    doc3 = "the cat sat on the mat"       # no repetition
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, None), (5, "   ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gxtext.repetition_stats(docs, "text").collect()
    }
    # doc1: words = [spam]*4, chars=16; bigram (spam,spam) x3 -> 3*8/16=1.0 capped
    # trigram (spam,spam,spam) x2 -> top 2*12/16=1.0 capped; dup same
    r1 = got[1]
    assert r1["dup_line_frac"] == 0.0
    assert r1["top_bigram_char_frac"] == 1.0
    assert r1["top_trigram_char_frac"] == 1.0
    assert r1["dup_trigram_char_frac"] == 1.0
    assert r1["unigram_entropy"] == pytest.approx(0.0)
    # doc2: 3 lines, 'a b' repeats once -> 1/3; chars 3+3+3 -> 3/9
    r2 = got[2]
    assert r2["dup_line_frac"] == pytest.approx(1 / 3)
    assert r2["dup_line_char_frac"] == pytest.approx(1 / 3)
    # words a b a b c d: top bigram ('b','a')? counts: (a,b)x2,(b,a)x1,(b,c),(c,d)
    # top = (a,b) x2 -> 2*2/6 chars... words chars = 6
    assert r2["top_bigram_char_frac"] == pytest.approx(4 / 6)
    # doc3: no dup lines, all bigrams unique -> top bigram occurs once
    r3 = got[3]
    assert r3["dup_line_frac"] == 0.0
    assert r3["dup_trigram_char_frac"] == 0.0
    words = doc3.split()
    n_chars = sum(len(w) for w in words)
    assert r3["top_bigram_char_frac"] == pytest.approx(
        (len("the") + len("cat")) / n_chars
    )
    # entropy: 'the' x2, others x1 (6 words)
    probs = [2 / 6] + [1 / 6] * 4
    want = -sum(p * math.log(p) for p in probs)
    assert r3["unigram_entropy"] == pytest.approx(want)
    stat_keys = [k for k in got[4] if k not in ("doc_id", "text")]
    assert all(got[4][k] is None for k in stat_keys)
    assert all(got[5][k] is None for k in stat_keys)


# ---------------------------------------------------------------------------
# round-4 review-fix regressions (dedup / similarity / langid)
# ---------------------------------------------------------------------------


def test_minhash_rejects_bad_banding(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    with pytest.raises(ValueError, match="bands"):
        dedup.minhash_candidate_pairs(
            df, "id", num_hashes=64, bands=128
        )
    with pytest.raises(ValueError, match="bands"):
        dedup.minhash_candidate_pairs(df, "id", num_hashes=64, bands=12)


def test_exact_dedup_null_text_rows_all_survive(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "hello"), (4, "hello")],
        "id long, text string",
    )
    kept = sorted(r["id"] for r in dedup.exact_dedup(df, "text").collect())
    assert 1 in kept and 2 in kept  # NULLs are not duplicates
    assert len(kept) == 3  # one of 3/4 collapsed
    # order_by path too
    kept2 = sorted(
        r["id"]
        for r in dedup.exact_dedup(df, "text", order_by="id").collect()
    )
    assert kept2 == [1, 2, 3]


def test_simhash_null_texts_never_pair(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "  "), (4, "hello world here")],
        "id long, text string",
    )
    pairs = dedup.simhash_candidate_pairs(
        df, "id", "text", expected_corpus_size=4
    )
    assert pairs.count() == 0


def test_langid_unsupported_script_is_und():
    from great_expectations_spark.functions.langid import classify, classify_np

    for text in ("你好世界这是一个中文句子", "مرحبا بالعالم هذه جملة عربية"):
        assert classify(text) == "und"
        assert classify_np(text) == "und"
    # supported languages unaffected
    assert classify("the quick brown fox jumps over the lazy dog") == "en"
    assert classify_np("the quick brown fox jumps over the lazy dog") == "en"


def test_conversation_dedup_preserves_turn_boundaries(spark):
    rows = [
        ("a", 0, "hello world"),
        ("b", 0, "hello"), ("b", 1, "world"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    kept = {
        r["conv_id"]
        for r in dedup.conversation_dedup(df, method="exact")
        .select("conv_id").distinct().collect()
    }
    assert kept == {"a", "b"}  # different turn structure != duplicate


def test_embedding_near_dup_null_first_row_and_empty_schema(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [1.0, 0.001])],
        "vec_id long, embedding array<double>",
    )
    pairs = similarity.embedding_near_dup_pairs(df, threshold=0.9, n_bits=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(2, 3)}
    empty = spark.createDataFrame([], "vec_id string, embedding array<double>")
    out = similarity.embedding_near_dup_pairs(empty)
    assert dict(out.dtypes)["id_a"] == "string"
    assert out.count() == 0


def test_release_cached_registry(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i} with words") for i in range(10)],
        "id long, text string",
    )
    dedup.minhash_candidate_pairs(df, "id", num_hashes=16, bands=4).count()
    assert dedup.release_cached() >= 1
    assert dedup.release_cached() == 0


def test_array_lit_f64_bit_exact_and_fast(spark):
    """The one-py4j-call array literal round-trips doubles BIT-exactly
    through the SQL parser (shortest-repr is re-parse exact), including
    subnormals and extremes; NaN/inf are rejected."""
    import random
    import struct

    from great_expectations_spark.functions._exprutil import array_lit_f64

    random.seed(7)
    vals = [0.0, -0.0, 1e-300, -1e-300, 1e300, 5e-324,
            1.7976931348623157e308, 123456789.123456789]
    vals += [
        struct.unpack("<d", struct.pack("<q", random.getrandbits(63)))[0]
        for _ in range(100)
    ]
    vals = [v for v in vals if v == v and abs(v) != float("inf")]
    got = spark.range(1).select(array_lit_f64(vals).alias("a")).first()["a"]
    assert all(
        struct.pack("<d", v) == struct.pack("<d", g)
        for v, g in zip(vals, got)
    )
    assert spark.range(1).select(
        F.size(array_lit_f64([])).alias("s")
    ).first()["s"] == 0
    for bad in (float("nan"), float("inf")):
        with pytest.raises(ValueError):
            array_lit_f64([bad])


def test_image_phash_invariances_and_planted_near_dups(spark):
    """Perceptual image dedup: the block-mean/median pHash is invariant
    to brightness shift and resize, tolerant of small noise, and the
    banded pair join finds exactly the planted near-duplicates among
    distinct base images (real netpbm decode, no external libs)."""
    import numpy as np

    rng = np.random.default_rng(11)
    bases = [
        rng.integers(20, 200, size=(24, 32, 3)).astype(np.uint8)
        for _ in range(8)
    ]
    rows = []
    for i, img in enumerate(bases):
        rows.append((i * 10, bytearray(multimodal.encode_ppm(img))))
        # planted near-dup A: +10 brightness (no clipping: pixels <= 210)
        rows.append(
            (i * 10 + 1, bytearray(multimodal.encode_ppm(img + 10)))
        )
    # local invariance checks on base 0
    h0 = multimodal.image_phash_value(bases[0])
    assert bin(h0 % (1 << 64)).count("1") <= 32  # median split
    assert multimodal.image_phash_value(bases[0] + 10) == h0  # brightness
    up = np.repeat(np.repeat(bases[0], 2, axis=0), 2, axis=1)
    assert multimodal.image_phash_value(up) == h0  # 2x resize

    df = spark.createDataFrame(rows, "img_id long, data binary")
    pairs = multimodal.image_near_dup_pairs(
        df, "img_id", max_hamming=3, deterministic_fake=False,
        expected_corpus_size=16,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every planted brightness pair found at hamming 0...
    assert {(i * 10, i * 10 + 1) for i in range(8)} <= got
    assert all(
        r["hamming"] == 0 for r in pairs if r["id_b"] - r["id_a"] == 1
    )
    # ...and no cross-base pair (random 24x32 bases are ~32 bits apart)
    assert all(b - a == 1 for a, b in got)


def test_image_phash_spark_deterministic_and_null_safe(spark):
    import numpy as np

    img = np.arange(24 * 32 * 3, dtype=np.uint64).reshape(24, 32, 3)
    data = multimodal.encode_ppm((img % 256).astype(np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, None), (3, bytearray(data))],
        "img_id long, data binary",
    )
    out = {
        r["img_id"]: r["phash"]
        for r in multimodal.image_phash(
            df, deterministic_fake=False
        ).collect()
    }
    assert out[1] == out[3] and out[2] is None
    out2 = {
        r["img_id"]: r["phash"]
        for r in multimodal.image_phash(
            df.repartition(3), deterministic_fake=False
        ).collect()
    }
    assert out == out2  # partitioning-independent
    # null bytes never pair
    pairs = multimodal.image_near_dup_pairs(
        df, "img_id", max_hamming=3, deterministic_fake=False
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}
