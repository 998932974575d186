"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
* Exact dedup is a hash-groupBy (map-side combined — hot duplicate groups
  collapse before the shuffle).
* MinHash signatures: default engine is ONE Arrow batch pass (normalize ->
  shingle -> blake2b hash -> numpy multiply-shift min) — Catalyst runs
  higher-order functions interpreted, so the equivalent JVM expression
  chain pays heavy first-execution JIT; a pure-JVM expression engine
  (``signature_engine="jvm"``: xxhash64 family + ``array_min``) remains
  for zero-Python deployments.
* LSH banding: signatures are sliced into bands, each band hashed to a
  bucket (one ``hash(slice(sig))`` per band — tiny expression tree);
  candidate pairs come from a self-join *within buckets only* (quadratic
  only in bucket size, never in table size).  Verification (true Jaccard)
  runs on candidates only.
* SimHash runs as an Arrow-batched pandas UDF (numpy bit ops); hamming
  distance via JVM ``bit_count(a ^ b)``.
"""

from __future__ import annotations

import re
from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from great_expectations_spark.functions.text import normalize_text

def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition UP to the session's default parallelism when the input
    arrives under-partitioned (e.g. one small parquet file -> 1 task, so
    the whole shingle/signature compute would run single-threaded).  Never
    repartitions DOWN — a 100 TB corpus already has thousands of
    partitions and keeps them."""
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:  # pragma: no cover — connect-mode etc.
        pass
    return df


# Python replica of the JVM normalization (text.normalize_text =
# regexp_replace(lower(trim(col)), '\\s+', ' ')).  Java regex \s is the
# ASCII class [ \t\n\x0B\f\r] (no NBSP/Unicode spaces) and Spark trim
# strips ASCII space only — Python's default str.strip()/re '\s' are
# Unicode-wide and would tokenize 'foo bar' differently, diverging
# the Arrow signatures from the JVM ones.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")


def _normalize_py(t: str) -> str:
    return _JAVA_WS_RE.sub(" ", t.strip(" ").lower())


# Cached intermediates (signature tables) registered by the pair
# generators.  persist() without a matching unpersist would pin one
# cached table per call for the SparkSession lifetime — a curation job
# looping over many corpora in one session would thrash storage memory.
_CACHED: list = []


def _register_cache(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every cached intermediate registered by the dedup/ANN
    pair generators in this process.  Safe at any time — Spark
    recomputes if a still-live plan needs the data — so call it between
    corpora in a long-running session.  Returns the number released."""
    n = 0
    while _CACHED:
        try:
            _CACHED.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
        n += 1
    return n


def _py_shingles(t: str, k: int) -> set:
    """THE tokenization contract shared by every Arrow engine (MinHash,
    SimHash, n-gram): normalize (trim/lower/collapse whitespace) then
    DISTINCT k-word shingles; texts shorter than k words collapse to one
    whole-text shingle.  A change here changes all three engines'
    pair sets together — the parity tests pin it against the JVM
    ``word_shingles`` chain."""
    words = _normalize_py(t).split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _blake2b8_np(shingles):
    """uint64 blake2b-8 digests of shingle strings (numpy array)."""
    import hashlib

    import numpy as np

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )


# --- exact ----------------------------------------------------------------


def exact_duplicate_stats(df: DataFrame, column: str = "text") -> DataFrame:
    """One row: (n_rows, n_distinct, n_duplicate_rows) for the column's
    normalized content."""
    key = F.xxhash64(normalize_text(F.col(column)))
    df = _ensure_parallelism(df)
    groups = df.filter(F.col(column).isNotNull()).groupBy(
        key.alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    return groups.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
        ).alias("n_duplicate_rows"),
    )


def exact_dedup(
    df: DataFrame, column: str = "text", order_by: Optional[str] = None
) -> DataFrame:
    """Keep one row per normalized-content group (deterministic winner when
    ``order_by`` given).  Shuffles by content hash, not by raw text.

    NULL-text rows all survive: a missing document is not a duplicate
    of another missing document (xxhash64 of NULL would otherwise
    collapse them all onto the seed value), matching
    ``exact_duplicate_stats``/the near-dup engines, which skip NULLs.
    """
    base = _ensure_parallelism(df)
    nulls = base.filter(F.col(column).isNull())
    key = F.xxhash64(normalize_text(F.col(column))).alias("__gx_key")
    out = base.filter(F.col(column).isNotNull()).withColumn(
        "__gx_key", key
    )
    if order_by is None:
        return (
            out.dropDuplicates(["__gx_key"])
            .drop("__gx_key")
            .unionByName(nulls)
        )
    w = Window.partitionBy("__gx_key").orderBy(F.col(order_by))
    return (
        out.withColumn("__gx_rn", F.row_number().over(w))
        .filter(F.col("__gx_rn") == 1)
        .drop("__gx_key", "__gx_rn")
        .unionByName(nulls)
    )


# --- shingles / MinHash ---------------------------------------------------


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>)."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    return F.array_distinct(
        F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        )
    )


def shingle_hashes(shingles: Column) -> Column:
    """Hash each shingle string to a long ONCE — the hash family for the
    signature then operates on longs (8-byte hashing), not on repeated
    string traversals."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature (array<long> of length num_hashes), one xxhash64
    family member per permutation — all JVM-side."""
    return minhash_signature_from_hashes(shingle_hashes(shingles), num_hashes)


def minhash_signature_from_hashes(
    hashes: Column, num_hashes: int = 64
) -> Column:
    return F.array(
        *[
            F.array_min(
                F.transform(hashes, lambda h: F.xxhash64(h, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )


_MINHASH_SEED = 1234567


def _minhash_family(num_hashes: int):
    """Deterministic multiply-shift hash family (odd multipliers + offsets)
    over uint64, seeded — the standard 2-universal family for MinHash."""
    import numpy as np

    rng = np.random.default_rng(_MINHASH_SEED)
    mult = (
        rng.integers(1, 2**62, num_hashes, dtype=np.int64).astype(np.uint64)
        * 2
        + 1
    )
    add = rng.integers(0, 2**62, num_hashes, dtype=np.int64).astype(np.uint64)
    return mult, add


def minhash_signature_arrow(num_hashes: int = 64):
    """Arrow-batched signature UDF: one numpy (num_hashes × n_shingles)
    multiply-add-min per document.  Catalyst doesn't codegen ``transform``/
    ``array_min`` chains, so 64 interpreted array traversals per row lose
    to one vectorized batch; this is the sanctioned Arrow fallback, not a
    per-row Python UDF."""
    mult, add = _minhash_family(num_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(hashes: pd.Series) -> pd.Series:
        import numpy as np

        def one(h):
            if h is None or len(h) == 0:
                return None
            arr = np.asarray(h, dtype=np.int64).view(np.uint64)
            m = mult[:, None] * arr[None, :] + add[:, None]  # uint64 wrap
            return m.min(axis=1).view(np.int64).tolist()

        return hashes.map(one)

    return sig


def _shingles_and_signature_arrow(shingle_k: int, num_hashes: int):
    """One Arrow pass: normalize -> k-word shingles -> 8-byte blake2b
    shingle hashes -> multiply-shift MinHash signature, all in Python/
    numpy.  Semantics mirror ``word_shingles`` + ``shingle_hashes`` (trim,
    lower, collapse whitespace, distinct shingles; texts shorter than k
    words collapse to one whole-text shingle).  This exists because the
    equivalent JVM expression chain is interpreted (no codegen for
    higher-order functions) and its first-execution JIT dominated the
    operator's wall time; one vectorized batch avoids both."""
    mult, add = _minhash_family(num_hashes)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("sh", T.ArrayType(T.LongType())),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        )
    )
    def both(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        def one(t):
            if t is None:
                return None, None
            h = _blake2b8_np(_py_shingles(t, shingle_k))
            m = mult[:, None] * h[None, :] + add[:, None]  # uint64 wrap
            return (
                np.unique(h).view(np.int64).tolist(),
                m.min(axis=1).view(np.int64).tolist(),
            )

        pairs = [one(t) for t in texts]
        return pd.DataFrame(
            {"sh": [p[0] for p in pairs], "sig": [p[1] for p in pairs]}
        )

    return both


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def minhash_candidate_pairs(
    df: DataFrame,
    id_column: str,
    text_column: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: Optional[float] = 0.7,
    signature_engine: str = "arrow",
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH.

    Returns (id_a, id_b, jaccard_est[, jaccard]) with id_a < id_b.
    The per-bucket self-join is the only join; bucket keys are
    (band_index, band_hash), so the shuffle is on tiny keys, AQE splits
    skewed buckets.  ``signature_engine``: "arrow" (numpy-vectorized
    batch, default) or "jvm" (pure expression path, zero Python).
    """
    if not 1 <= bands <= num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(bands > num_hashes would hash EMPTY signature slices — "
            "every document lands in one bucket and the candidate join "
            "degenerates to all-pairs; a non-divisor silently drops "
            "trailing signature rows)"
        )
    rows_per_band = num_hashes // bands
    df = _ensure_parallelism(df)
    if signature_engine == "arrow":
        # hashed shingle set + signature in ONE Arrow batch pass
        both = _shingles_and_signature_arrow(shingle_k, num_hashes)
        sig = (
            df.select(
                F.col(id_column).alias("__id"),
                both(F.col(text_column)).alias("__b"),
            )
            .select(
                "__id",
                F.col("__b.sh").alias("__sh"),
                F.col("__b.sig").alias("__sig"),
            )
            .filter(F.col("__sh").isNotNull() & (F.size("__sh") > 0))
        )
    else:
        base = df.select(
            F.col(id_column).alias("__id"),
            # hashed shingle set: signature derivation AND jaccard
            # verification both run on longs (hash collisions negligible vs
            # the 64-bit space), never re-traversing shingle strings
            F.array_distinct(
                shingle_hashes(word_shingles(F.col(text_column), shingle_k))
            ).alias("__sh"),
        ).filter(F.size("__sh") > 0)
        sig = base.withColumn(
            "__sig", minhash_signature_from_hashes(F.col("__sh"), num_hashes)
        )

    sig = _register_cache(sig)
    # candidate generation works on (id, band, bucket) ONLY — no arrays
    # travel through the shuffle, and duplicate pairs (same pair caught by
    # several bands) are deduped BEFORE any verification work.  One
    # hash(slice) per band keeps the expression tree tiny (a 16×4-column
    # concat tree made codegen the dominant cold cost).
    banded = sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(
                    F.slice(
                        F.col("__sig"), b * rows_per_band + 1, rows_per_band
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    payload = sig.select(
        F.col("__id"), F.col("__sig"), F.col("__sh")
    )
    pa = payload.alias("pa")
    pb = payload.alias("pb")
    pairs = (
        candidates.join(pa, F.col("id_a") == F.col("pa.__id"))
        .join(pb, F.col("id_b") == F.col("pb.__id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("pa.__sig"),
                            F.col("pb.__sig"),
                            lambda x, y: x == y,
                        ),
                        lambda v: v,
                    )
                )
                / F.lit(num_hashes)
            ).alias("jaccard_est"),
            jaccard(F.col("pa.__sh"), F.col("pb.__sh")).alias("jaccard"),
        )
    )
    if verify_threshold is not None:
        pairs = pairs.filter(F.col("jaccard") >= verify_threshold)
    return pairs


def minhash_band_keys(
    df: DataFrame,
    id_column: str,
    text_column: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    extra_columns: Optional[List[str]] = None,
) -> DataFrame:
    """Per-document MinHash LSH band keys: one row per (document, band)
    with ``(id, band, bucket)`` plus any ``extra_columns`` carried
    through.  Same shingle/signature/banding derivation as
    :func:`minhash_candidate_pairs` (one Arrow pass, ``hash(slice(sig),
    band)`` bucket keys), exposed for consumers that manage their own
    band state — e.g. :func:`streaming.validate_stream.streaming_near_dedup`,
    which registers band keys across microbatches.  Documents with no
    shingles (null / empty / shorter than ``shingle_k`` words) produce
    NO rows."""
    if not 1 <= bands <= num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
        )
    rows_per_band = num_hashes // bands
    both = _shingles_and_signature_arrow(shingle_k, num_hashes)
    carried = [F.col(c) for c in (extra_columns or [])]
    sig = (
        df.select(
            F.col(id_column).alias("__id"),
            *carried,
            both(F.col(text_column)).alias("__b"),
        )
        .select(
            "__id",
            *[c for c in (extra_columns or [])],
            F.col("__b.sig").alias("__sig"),
            F.col("__b.sh").alias("__sh"),
        )
        .filter(F.col("__sh").isNotNull() & (F.size("__sh") > 0))
        .drop("__sh")
    )
    return sig.select(
        "__id",
        *[c for c in (extra_columns or [])],
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(
                    F.slice(
                        F.col("__sig"), b * rows_per_band + 1, rows_per_band
                    ),
                    b,
                ),
            )
        ).alias("band", "bucket"),
    )


# --- SimHash --------------------------------------------------------------


def _simhash_from_features(features) -> int:
    """64-bit SimHash of a list of feature strings: per feature one 8-byte
    blake2b digest; bit i of the signature is set iff the (+1/-1) majority
    vote of the features' bit i is strictly positive.  The per-feature
    loop is only the (unavoidable) hashlib calls; the bit accumulation is
    ONE unpackbits + sum over the whole (n_features x 64) matrix."""
    import hashlib

    import numpy as np

    n = len(features)
    if n == 0:
        return 0
    digests = b"".join(
        hashlib.blake2b(f.encode("utf-8"), digest_size=8).digest()
        for f in features
    )
    bits = np.unpackbits(
        np.frombuffer(digests, dtype=np.uint8).reshape(n, 8),
        axis=1,
        bitorder="little",
    )
    acc = 2 * bits.sum(axis=0, dtype=np.int64) - n
    packed = np.packbits((acc > 0).astype(np.uint8), bitorder="little")
    out = int.from_bytes(packed.tobytes(), "little")
    return out - (1 << 64) if out >= (1 << 63) else out


def _simhash_udf():
    @F.pandas_udf(T.LongType())
    def simhash(tokens: pd.Series) -> pd.Series:
        def one(tok_list) -> int:
            if tok_list is None:
                return 0
            return _simhash_from_features(list(tok_list))

        return tokens.map(one)

    return simhash


def _text_to_simhash_arrow(shingle_k: int):
    """ONE Arrow pass text -> signature: normalize -> distinct k-word
    shingles -> blake2b -> majority-vote bits, all in Python/numpy.
    Mirrors the MinHash one-pass lesson (``_shingles_and_signature_arrow``):
    the JVM ``word_shingles`` expression chain is interpreted (no codegen
    for higher-order functions) and feeding its array output through a
    second UDF pays serialization both ways; going straight from text
    costs one batch.  Semantics are exactly ``simhash64``: lower + trim +
    collapse whitespace, DISTINCT shingles, texts shorter than k words
    collapse to one whole-text shingle, NULL text -> signature 0."""

    @F.pandas_udf(T.LongType())
    def sig(texts: pd.Series) -> pd.Series:
        def one(t) -> int:
            if t is None:
                return 0
            return _simhash_from_features(_py_shingles(t, shingle_k))

        return texts.map(one)

    return sig


def simhash64(col: Column, shingle_k: int = 3) -> Column:
    """64-bit SimHash over k-word shingle features (Arrow-batched UDF).

    Shingle features (k>=2) are the standard choice for near-duplicate
    detection: near-dup docs share most shingles so their fingerprints land
    within a few bits, while unrelated docs that merely share vocabulary
    share almost no shingles and land ~32 bits apart — a clean hamming gap
    unigram tokens cannot give on short texts.  ``shingle_k=1`` degrades to
    the classic token-frequency SimHash.
    """
    if shingle_k <= 1:
        features = F.split(normalize_text(col), " ")
    else:
        features = word_shingles(col, shingle_k)
    return _simhash_udf()(features)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_block_bounds(n_blocks: int) -> List[tuple]:
    """Split the 64 signature bits into n_blocks near-equal [start, width)
    spans."""
    bounds, start = [], 0
    for i in range(n_blocks):
        width = (64 - start) // (n_blocks - i)
        bounds.append((start, width))
        start += width
    return bounds


_SIMHASH_COMBO_CAP = 512


def choose_simhash_blocks(
    max_hamming: int,
    expected_corpus_size: Optional[int] = None,
    combo_cap: int = _SIMHASH_COMBO_CAP,
) -> int:
    """Pick ``n_blocks`` for :func:`simhash_candidate_pairs` so the bucket
    join stays sub-quadratic.

    Bucket key width is ``(n_blocks - H) * 64 / n_blocks`` bits and key
    count per row is ``C(n_blocks, H)`` — width and count both grow with
    ``n_blocks``, so this picks the SMALLEST config meeting the safety
    criterion:

    * with ``expected_corpus_size`` n: expected candidate partners per doc
      ``C(n_blocks, H) * n / 2^(width+1)`` must be <= 64 (candidate join
      stays near-linear); if no config under ``combo_cap`` achieves it,
      raise — the caller asked for a scale this banding scheme cannot
      serve (route to MinHash, or lower ``max_hamming``);
    * without a hint: key width >= 16 bits (expected bucket size n/65536 —
      safe through ~10^6-10^7 docs); if unreachable, fall back to the
      widest feasible key and WARN instead of silently going quadratic.
    """
    import math
    import warnings

    feasible = [
        n
        for n in range(max_hamming + 1, 65)
        if math.comb(n, max_hamming) <= combo_cap
    ]
    if not feasible:
        raise ValueError(
            f"no banding config for max_hamming={max_hamming} fits "
            f"combo_cap={combo_cap}; lower max_hamming"
        )

    def width(n: int) -> float:
        return (n - max_hamming) * 64.0 / n

    if expected_corpus_size is not None:
        for n in feasible:
            partners = (
                math.comb(n, max_hamming)
                * expected_corpus_size
                / 2.0 ** (width(n) + 1)
            )
            if partners <= 64.0:
                return n
        raise ValueError(
            f"simhash banding cannot stay sub-quadratic at "
            f"max_hamming={max_hamming} for ~{expected_corpus_size} docs "
            f"(widest feasible key is {width(feasible[-1]):.1f} bits with "
            f"C({feasible[-1]},{max_hamming})="
            f"{math.comb(feasible[-1], max_hamming)} tables); lower "
            "max_hamming or use minhash_candidate_pairs"
        )
    for n in feasible:
        if width(n) >= 16.0:
            return n
    best = feasible[-1]
    warnings.warn(
        f"simhash banding at max_hamming={max_hamming}: widest feasible "
        f"bucket key is {width(best):.1f} bits (< 16) — expected bucket "
        f"size is n_docs/2^{width(best):.1f}; pass expected_corpus_size= "
        "to get a hard guarantee or route large corpora to "
        "minhash_candidate_pairs",
        stacklevel=3,
    )
    return best


def _simhash_combo_keys_udf(bounds: List[tuple], combos: List[tuple]):
    """Arrow-batched bucket-key generator for high-combo banding configs.

    Computes, per signature, one 64-bit key per block-combination — the
    splitmix64-style mix of the combo's block values — fully vectorized in
    numpy (one (batch, n_combos) matrix, no per-row Python).  Used when
    ``C(n_blocks, H)`` is too large for a single codegen'd projection.
    """
    import numpy as np

    starts = [s for s, _ in bounds]
    masks = [
        np.uint64((1 << w) - 1) if w < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
        for _, w in bounds
    ]
    mix1 = np.uint64(0xBF58476D1CE4E5B9)
    mix2 = np.uint64(0x94D049BB133111EB)
    seed = np.uint64(0x9E3779B97F4A7C15)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def combo_keys(sim: pd.Series) -> pd.Series:
        s = sim.to_numpy(dtype=np.int64).view(np.uint64)
        blocks = [
            (s >> np.uint64(starts[i])) & masks[i] for i in range(len(bounds))
        ]
        out = np.empty((len(s), len(combos)), dtype=np.uint64)
        for t, combo in enumerate(combos):
            acc = np.full(len(s), seed, dtype=np.uint64)
            for b in combo:
                acc = (acc ^ blocks[b]) * mix1
                acc = (acc ^ (acc >> np.uint64(27))) * mix2
                acc ^= acc >> np.uint64(31)
            out[:, t] = acc
        signed = out.view(np.int64)
        return pd.Series(list(signed))

    return combo_keys


def simhash_candidate_pairs(
    df: DataFrame,
    id_column: str,
    text_column: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 3,
    n_blocks: Optional[int] = None,
    expected_corpus_size: Optional[int] = None,
) -> DataFrame:
    """SimHash near-dup pairs via block-combination banding (the
    permute-and-split scheme of Manku et al., WWW'07, re-expressed as a
    bucket join).

    The 64-bit signature is split into ``n_blocks`` near-equal bit blocks.
    If two signatures differ in at most ``max_hamming`` bits then at most
    ``max_hamming`` blocks differ, so every pair within distance H agrees
    on SOME combination of ``n_blocks - max_hamming`` blocks (pigeonhole).
    Each row therefore emits one bucket key per C(n_blocks, n_blocks-H)
    block-combination — the key is the hash of the concatenated block
    values — and candidates come from a self-join within buckets only.

    Scale knob: bucket key width is ``(n_blocks - H) * 64/n_blocks`` bits.
    When ``n_blocks`` is not given, :func:`choose_simhash_blocks` picks the
    smallest config whose key width is >= 16 bits (or, with an
    ``expected_corpus_size`` hint, whose expected candidate join is O(n)),
    warning/raising when ``max_hamming`` is too high for any sub-quadratic
    banding — a bare ``max_hamming=10`` can no longer silently produce
    ~6-bit keys and an n²/64 bucket join.  The pigeonhole recall guarantee
    holds for any ``n_blocks > max_hamming``, so the returned pair set is
    identical across configs.
    """
    sigs = (
        _ensure_parallelism(df)
        # NULL/blank texts all hash to signature 0 and would pair with
        # each other at hamming 0 (and with any real doc whose signature
        # is 0); the minhash path skips them too — a missing document
        # has no near-duplicates
        .filter(
            F.col(text_column).isNotNull()
            & (F.length(F.trim(F.col(text_column))) > 0)
        )
        .select(
            F.col(id_column).alias("__id"),
            # one-pass text -> signature (same semantics as simhash64, one
            # Arrow batch instead of interpreted JVM shingling + a second
            # UDF)
            _text_to_simhash_arrow(shingle_k)(F.col(text_column)).alias(
                "__sim"
            ),
        )
    )
    return _band_join_on_sigs(
        sigs, max_hamming, n_blocks, expected_corpus_size
    )


def hamming_band_pairs(
    df: DataFrame,
    id_column: str,
    signature_column: str,
    max_hamming: int = 3,
    n_blocks: Optional[int] = None,
    expected_corpus_size: Optional[int] = None,
) -> DataFrame:
    """Pairs of rows whose 64-bit signatures are within ``max_hamming``
    bits, via the same block-combination banding
    :func:`simhash_candidate_pairs` uses — the signature-AGNOSTIC core.
    Text SimHash feeds it a shingle hash; image perceptual hashes
    (``multimodal.image_near_dup_pairs``) feed it a block-mean pHash;
    any other 64-bit locality-preserving signature works the same.
    NULL signatures are skipped (a missing payload has no
    near-duplicates).  Returns ``(id_a, id_b, hamming)`` with the exact
    Hamming distance verified — banding only generates candidates, the
    pigeonhole guarantee makes the pair set complete."""
    sigs = (
        _ensure_parallelism(df)
        .filter(F.col(signature_column).isNotNull())
        .select(
            F.col(id_column).alias("__id"),
            F.col(signature_column).cast("long").alias("__sim"),
        )
    )
    return _band_join_on_sigs(
        sigs, max_hamming, n_blocks, expected_corpus_size
    )


def _band_join_on_sigs(
    sigs: DataFrame,
    max_hamming: int,
    n_blocks: Optional[int],
    expected_corpus_size: Optional[int],
) -> DataFrame:
    """Shared banding core over a ``(__id, __sim)`` frame: emit one
    bucket key per block-combination, self-join within buckets, verify
    exact Hamming distance.  The shuffle carries (id, table, key) only."""
    from itertools import combinations

    if n_blocks is None:
        n_blocks = choose_simhash_blocks(max_hamming, expected_corpus_size)
    if n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole guarantee"
        )
    keep = n_blocks - max_hamming
    combos = list(combinations(range(n_blocks), keep))
    if len(combos) > 512:
        raise ValueError(
            f"C({n_blocks},{keep}) = {len(combos)} bucket tables — too many; "
            "lower n_blocks or split the job"
        )
    bounds = _simhash_block_bounds(n_blocks)

    def block_value(sim: Column, idx: int) -> Column:
        start, width = bounds[idx]
        if width >= 64:  # single-block case: the whole signature is the key
            return sim
        mask = (1 << width) - 1
        return F.shiftright(sim, start).bitwiseAND(F.lit(mask))

    sigs = _register_cache(sigs)
    # one bucket key per block-combination; keys are 8-byte hashes so the
    # shuffle carries (id, table, key) only — no text, no signatures.
    # posexplode: the array POSITION is the table id — no struct per combo.
    if len(combos) <= 64:
        # JVM path: block values materialized ONCE (n_blocks shift/mask
        # exprs), each combo key an xxhash64 over `keep` plain columns —
        # stays inside whole-stage codegen at small combo counts
        blocked = sigs.select(
            "__id",
            *[
                block_value(F.col("__sim"), i).alias(f"__b{i}")
                for i in range(n_blocks)
            ],
        )
        keyed = blocked.select(
            "__id",
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(*[F.col(f"__b{b}") for b in combo])
                        for combo in combos
                    ]
                )
            ).alias("table", "key"),
        )
    else:
        # high-combo configs (e.g. C(13,10)=286 at max_hamming=10) blow
        # the 64 KB JVM codegen method limit and fall back to interpreted
        # eval; a vectorized Arrow batch computes all combo keys in numpy
        # instead (splitmix64-style mixing — deterministic, same recall)
        keyed = sigs.select(
            "__id",
            F.posexplode(
                _simhash_combo_keys_udf(bounds, combos)(F.col("__sim"))
            ).alias("table", "key"),
        )
    left, right = keyed.alias("l"), keyed.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col("__id").alias("id_a"), F.col("__sim").alias("__sim_a"))
    sb = sigs.select(F.col("__id").alias("id_b"), F.col("__sim").alias("__sim_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("__sim_a"), F.col("__sim_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --- n-gram Jaccard (exact, for verification / small candidate sets) ------


def _shingle_hashes_arrow(shingle_k: int):
    """Arrow-batched distinct shingle hashes (array<long>): same
    tokenization contract as ``word_shingles`` + ``shingle_hashes`` (Java
    \\s whitespace, lower/trim, <k words -> whole-text shingle) with the
    blake2b-8 hash of ``_shingles_and_signature_arrow``.  Hash VALUES
    differ from the JVM xxhash64 path by design — every consumer joins
    the hashes against themselves, so any 64-bit family gives identical
    pair sets and intersection counts."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sh(texts: pd.Series) -> pd.Series:
        import numpy as np

        def one(t):
            if t is None:
                return None
            h = _blake2b8_np(_py_shingles(t, shingle_k))
            return np.unique(h).view(np.int64).tolist()

        return texts.map(one)

    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_column: str,
    text_column: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_frequency: Optional[int] = 10_000,
    shingle_engine: str = "arrow",
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via shingle inverted index: explode
    shingles, join on shingle, count shared, compute |A∩B|/|A|+|B|-|A∩B|.
    Distributed (shuffle on shingle keys) — no cartesian product.

    A shingle appearing in d documents emits d(d-1)/2 pair rows, so one
    corpus-common shingle goes quadratic.  ``max_doc_frequency`` drops
    shingles with document frequency above the cap BEFORE the join
    (standard stop-shingle practice); since such shingles are shared by a
    large fraction of the corpus they carry almost no Jaccard signal for
    high thresholds, and the per-shingle pair fan-out stays bounded by
    cap²/2.  Doc sizes (``__n``) are computed AFTER the filter so the
    Jaccard numerator and denominator use the same shingle universe — the
    result is the exact Jaccard of the stop-shingle-filtered sets, not a
    systematic underestimate of the unfiltered one.  Pass ``None`` to
    disable (exact semantics, small corpora only) — or route truly large
    corpora to ``minhash_candidate_pairs``.

    ``shingle_engine``: "arrow" (default — ONE vectorized batch per
    partition; same reasoning as the MinHash default: Catalyst interprets
    higher-order array expressions, so the JVM shingle chain pays per-row
    interpretation + first-execution JIT) or "jvm" (zero-Python
    expression path).  Both produce identical pair sets and Jaccard
    values — the 8-byte shingle hashes only ever join against themselves.
    """
    # 8-byte shingle hashes: the inverted-index shuffle carries longs,
    # not multi-word strings (collisions negligible in 64-bit space
    # and symmetric across both sides, so intersection counts match)
    if shingle_engine == "arrow":
        sh_col = _shingle_hashes_arrow(k)(F.col(text_column))
    elif shingle_engine == "jvm":
        sh_col = F.array_distinct(
            shingle_hashes(word_shingles(F.col(text_column), k))
        )
    else:
        raise ValueError(
            f"unknown shingle_engine {shingle_engine!r}: arrow | jvm"
        )
    base = _ensure_parallelism(df).select(
        F.col(id_column).alias("__id"), sh_col.alias("__sh")
    ).filter(F.size("__sh") > 0)
    inverted = base.select(
        "__id", F.explode("__sh").alias("shingle")
    )
    if max_doc_frequency is not None:
        # df-per-shingle is a map-side-combined count; the anti-join build
        # side holds only shingles ABOVE the cap (few, by Zipf) and AQE
        # picks broadcast when it is small
        hot = (
            inverted.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_doc_frequency)
            .select("shingle")
        )
        inverted = inverted.join(hot, "shingle", "left_anti")
    # sizes from the SAME (possibly filtered) universe as the intersection
    # join; shingles are array_distinct'd upstream so count == set size
    sizes = inverted.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    l, r = inverted.alias("l"), inverted.alias("r")
    shared = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .groupBy(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("n_a")
    )
    sb = sizes.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("n_b")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Candidate pairs -> duplicate clusters (connected components)
# --------------------------------------------------------------------------
#
# Near-dup pipelines emit PAIRS (a~b, b~c); deduplication needs CLUSTERS
# ({a,b,c} -> keep one).  Pair->cluster is connected components over the
# similarity graph.  Reference scope: tmilitino/great_expectations has no
# graph operator (its dedup surface stops at uniqueness expectations,
# expectations/core/expect_column_values_to_be_unique.py) — this is part
# of the beyond-reference LLM-pipeline family, like minhash/simhash above.
#
# Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
# "Connected Components in MapReduce and Beyond" — public paper), chosen
# over label propagation because it converges in O(log^2 n) rounds on ANY
# graph shape (label propagation needs diameter rounds: a 1M-long chain of
# near-dup shards would need 1M jobs).  Each round is two shuffles on the
# node key; neighborhood minima come from partition-key window aggregates
# (sort-based, spillable) — NO collect_list, so a hot node with 10M
# neighbors never materializes its neighborhood in one executor's heap.
# Lineage is truncated every round with localCheckpoint (iterative plans
# otherwise grow exponentially and re-execute from the source).


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round over an edge set.

    large-star: for every node u, connect each STRICTLY LARGER neighbor to
    min(N(u) ∪ {u}).  small-star: canonicalize edges to (hi, lo), connect
    each lo-side neighbor (and u itself) to the group minimum.
    """
    # ---- large-star over the symmetric edge view
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    with_min = sym.withColumn(
        "m", F.min(F.least(F.col("u"), F.col("v"))).over(w)
    )
    # duplicate emits are harmless to the next window min and are swept by
    # the ONE distinct at the end of the round (each distinct is a full
    # shuffle; intermediate ones only re-dedupe what the final one would)
    large = with_min.filter(F.col("v") > F.col("u")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    # ---- small-star on (hi, lo) canonical edges
    canon = large.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    canon = canon.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    rewired = canon.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    roots = canon.select("u", F.col("m").alias("v")).distinct()
    return rewired.union(roots).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Component label (= minimum member id) for every node that appears
    in ``pairs``.  Returns ``(id, component)``; singleton docs never enter
    the pair graph, so callers treat absent ids as their own component.

    Ids must be an orderable Spark type (long, string, ...).  Convergence
    is detected with a two-value fingerprint of the edge set (count +
    bit_xor of xxhash64) — one cheap agg per round, exact for our purpose
    (a changed edge set changes the xor with probability 1 - 2^-64).
    ``max_iterations`` is a safety valve only: star rounds converge in
    O(log^2 n); 50 covers any graph this engine could ever shuffle.

    Hybrid execution: candidate-pair graphs are orders of magnitude
    smaller than the corpus (only near-dup members carry edges), so when
    the deduped edge count is at or below ``driver_threshold`` the labels
    come from a driver-side union-find over ONE bounded collect (2M long
    pairs ≈ 32 MB) — each distributed star round costs several shuffles
    of fixed job overhead, which dominates wall time on small graphs.
    Above the cap the alternating star rounds run fully distributed; pass
    ``driver_threshold=0`` to force that path.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    spark = pairs.sparkSession

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    edges = edges.localCheckpoint(eager=True)
    fp = fingerprint(edges)
    if fp[0] == 0:
        id_type = dict(pairs.dtypes)[src]
        return spark.createDataFrame([], "id long, component long").select(
            F.col("id").cast(id_type).alias("id"),
            F.col("component").cast(id_type).alias("component"),
        )
    if fp[0] <= driver_threshold:
        # bounded by the count just measured — never an unguarded collect
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edges.collect():
            a, b = row["u"], row["v"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the component label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = [(x, find(x)) for x in parent]
        schema = T.StructType(
            [
                T.StructField("id", edges.schema["u"].dataType),
                T.StructField("component", edges.schema["u"].dataType),
            ]
        )
        return spark.createDataFrame(labels, schema)
    for _ in range(max_iterations):
        edges = _star_round(edges).localCheckpoint(eager=True)
        nxt = fingerprint(edges)
        if nxt == fp:
            break
        fp = nxt
    # at convergence every edge is (member, component-min) star spoke and
    # each root also appears as a spoke target; map roots to themselves
    members = edges.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    )
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.union(roots).distinct()


def duplicate_clusters(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-cluster summary over a candidate-pair graph: ``(component,
    size)`` for every connected component with >= 2 members (the clusters
    a dedup pass would collapse)."""
    labels = connected_components(pairs, src, dst)
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("size")
    )


def near_dedup(
    df: DataFrame,
    id_column: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster: the
    survivor is the cluster's MINIMUM id (deterministic, rerun-stable —
    content-based tie-breaks belong upstream in the pair threshold).
    Rows absent from the pair graph are singletons and survive untouched.
    The label side is the distinct node set of the candidate pairs —
    orders of magnitude smaller than the corpus — so AQE broadcasts it
    when it fits."""
    victims = (
        connected_components(pairs, src, dst)
        .filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_column))
    )
    return df.join(victims, id_column, "left_anti")


def dedup_corpus(
    df: DataFrame,
    id_column: str,
    text_column: str = "text",
    method: str = "minhash",
    threshold: float = 0.7,
    **pair_kwargs,
) -> DataFrame:
    """One-call corpus deduplication: candidate pairs (per ``method``) ->
    connected components -> drop every non-canonical cluster member (the
    survivor is the min id; see :func:`near_dedup`).  Returns the
    surviving rows of ``df`` with its original schema.

    Methods: ``exact`` (normalized-content hash groups — no pair graph,
    one dropDuplicates), ``minhash`` (LSH banding + verify at
    ``threshold``), ``ngram`` (exact inverted-index Jaccard at
    ``threshold``), ``simhash`` (block-banding; ``threshold`` ignored —
    pass ``max_hamming=`` instead).  ``pair_kwargs`` forward to the pair
    generator (``bands=``, ``max_doc_frequency=``, ``max_hamming=``...).
    """
    if method == "exact":
        return exact_dedup(df, text_column, order_by=id_column)
    if method == "minhash":
        pairs = minhash_candidate_pairs(
            df, id_column, text_column,
            verify_threshold=threshold, **pair_kwargs,
        )
    elif method == "ngram":
        pairs = ngram_jaccard_pairs(
            df, id_column, text_column, threshold=threshold, **pair_kwargs
        )
    elif method == "simhash":
        pairs = simhash_candidate_pairs(
            df, id_column, text_column, **pair_kwargs
        )
    else:
        raise ValueError(
            f"unknown dedup method {method!r}: "
            "expected exact | minhash | ngram | simhash"
        )
    return near_dedup(df, id_column, pairs)


# ---------------------------------------------------------------------------
# Conversation-level dedup (transcript tables: conv_id / turn_idx / text)
# ---------------------------------------------------------------------------


def assemble_conversations(
    df: DataFrame,
    conv_column: str = "conv_id",
    order_column: str = "turn_idx",
    text_column: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """One document row per conversation: turn texts concatenated under
    the STABLE (order, md5-hex-of-text) sort — the same deterministic
    tie-break the north rule's per-turn text-equality invariant uses
    (hex digits order identically under any collation), so assembly is
    byte-identical across engines, partitionings and reruns.

    One groupBy shuffle; ``collect_list`` is bounded by conversation
    length (groups are per conversation, never the whole table).
    Output: ``(conv_column, text, n_turns)`` — feed it to any
    document-level op (``minhash_candidate_pairs``,
    ``contamination_stats``, ``text_profile``...) to run that op at
    conversation granularity.
    """
    t = F.coalesce(F.col(text_column), F.lit(""))
    return df.groupBy(conv_column).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(order_column).alias("i"),
                            F.md5(t).alias("h"),
                            t.alias("t"),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def conversation_dedup(
    df: DataFrame,
    conv_column: str = "conv_id",
    order_column: str = "turn_idx",
    text_column: str = "text",
    method: str = "exact",
    threshold: float = 0.7,
    **pair_kwargs,
) -> DataFrame:
    """Drop duplicate CONVERSATIONS from a transcript table, keeping all
    turns of each surviving conversation (survivor = min conv id per
    duplicate cluster, deterministic).

    ``method='exact'``: conversations with identical ordered turn text
    collapse — the fingerprint is ``xxhash64`` of the RAW assembled
    document (newline-separated turns, no normalization: collapsing
    whitespace would merge ``['hello world']`` with
    ``['hello', 'world']`` across turn boundaries), so the only wide
    operation is the per-conversation groupBy.
    Other methods (``minhash | ngram | simhash``) treat each assembled
    conversation as a document and reuse the document-level candidate
    machinery (LSH banding etc.) — near-duplicate transcripts (same
    dialogue, minor edits) collapse too.

    Returns the original rows filtered to surviving conversations; the
    victim-id side of the anti-join is bounded by the duplicate count.
    """
    assembled = assemble_conversations(
        df, conv_column, order_column, text_column
    )
    if method == "exact":
        survivors = (
            assembled.select(
                F.col(conv_column),
                F.xxhash64(F.col("text")).alias("__fp"),
            )
            .groupBy("__fp")
            .agg(F.min(conv_column).alias(conv_column))
            .select(conv_column)
        )
        return df.join(survivors, conv_column, "left_semi")
    deduped = dedup_corpus(
        assembled,
        conv_column,
        "text",
        method=method,
        threshold=threshold,
        **pair_kwargs,
    )
    return df.join(
        deduped.select(conv_column), conv_column, "left_semi"
    )


# --- exact-substring dedup (repeated-span detection / removal) -------------
#
# Lee et al. 2021, "Deduplicating Training Data Makes Language Models
# Better" (public paper): remove every span of >= n tokens that occurs
# more than once in the corpus (their ExactSubstr, n=50).  The reference
# implementation builds a single-machine suffix array; this is the
# Spark-first re-expression: per-position chained-hash n-gram keys, one
# corpus-wide gram-count aggregation, and a bounded per-document
# interval merge — no suffix array, no driver-side corpus.


def _position_gram_keys(col: Column, n: int) -> Column:
    """Per-POSITION chained-hash n-gram keys: ``array<bigint>`` where
    index i (0-based) is the key of the gram starting at 1-based word
    position i+1.  Same 8-byte fold(xxhash64) scheme as
    ``curation._gram_keys`` but WITHOUT array_distinct — positions
    matter here.  Null/blank/too-short text yields an empty array."""
    words = F.split(normalize_text(col), " ")
    word_hashes = F.transform(words, lambda w: F.xxhash64(w))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
        lambda i: F.aggregate(
            F.slice(word_hashes, i, n),
            F.lit(0).cast("long"),
            lambda acc, x: F.xxhash64(acc, x),
        ),
    )
    blank = F.length(normalize_text(col)) == 0
    return F.when(
        col.isNull() | blank | (F.size(words) < n),
        F.array().cast("array<bigint>"),
    ).otherwise(grams)


def _merge_positions_to_spans(positions: Column, n: int) -> Column:
    """Fold a SORTED array of 1-based span-start positions into merged
    half-open word spans ``array<struct<start:int,end:int>>`` (each
    start covers [p, p+n)).  Pure JVM aggregate — per-document cost is
    linear in the duplicated-position count, which is bounded by the
    document's own length."""
    empty = F.array().cast("array<struct<start:int,end:int>>")

    def step(acc: Column, p: Column) -> Column:
        start = p.cast("int")
        end = (p + F.lit(n)).cast("int")
        last = F.element_at(acc, -1)
        appended = F.concat(
            acc,
            F.array(F.struct(start.alias("start"), end.alias("end"))),
        )
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["start"].alias("start"),
                    F.greatest(last["end"], end).alias("end"),
                )
            ),
        )
        return F.when(F.size(acc) == 0, appended).otherwise(
            # overlap OR adjacency: [p, p+n) touches [.., last.end)
            F.when(start <= last["end"], extended).otherwise(appended)
        )

    return F.aggregate(positions, empty, step)


def repeated_spans(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_column: str = "text",
    n: int = 50,
    min_count: int = 2,
    keep: str = "none",
    cache_positions: bool = False,
) -> DataFrame:
    """Per-document duplicated-substring spans (distributed ExactSubstr).

    A word position is *duplicated* when the ``n``-gram starting there
    occurs at least ``min_count`` times corpus-wide (within-document
    repeats count).  ``keep='none'`` marks every occurrence (the Lee et
    al. tool's behavior — all copies of a duplicated span are cut);
    ``keep='first'`` exempts the canonical first occurrence per gram
    (min ``(doc_id, position)`` — deterministic on any cluster size), so
    exactly one copy of each duplicated span survives removal.

    Returns ONE row per document that has at least one duplicated
    position: ``(doc_id, n_words, spans, n_dup_words, dup_fraction)``
    with ``spans`` the merged half-open 1-based word intervals.

    Plan shape at 10^12 tokens: one projection computes every position's
    8-byte gram key (chained xxhash64 — no gram strings), posexplode to
    (doc, pos, gram) — the corpus-in-positions working set a suffix
    array would also materialize — ONE map-side-combined groupBy(gram)
    for the counts, one 8-byte-keyed join back (dup-gram side is
    gram-distinct, so hot grams skew only the occurrence side, which is
    the data itself), and one groupBy(doc) whose state is bounded by
    document length.  Word-count lookup is a narrow second projection
    joined at the end (span rows only — bounded by the duplicated-doc
    count, not the corpus).

    The positions projection feeds both the gram count and the join
    back; by default it is recomputed (two corpus scans — cheap
    stateless expressions, no storage pressure).  Set
    ``cache_positions=True`` to persist it (MEMORY_AND_DISK, spills)
    and pay the scan once — the right call when the gram hashing
    dominates, e.g. very long documents; release with
    :func:`release_cached`.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    base = _ensure_parallelism(df)
    text = F.col(text_column)
    occ = base.select(
        F.col(doc_id).alias("__doc"),
        F.posexplode(_position_gram_keys(text, n)).alias("__p0", "__gram"),
    ).select("__doc", (F.col("__p0") + 1).alias("__pos"), "__gram")
    if cache_positions:
        # occ feeds BOTH the gram-count agg and the join back; without
        # the cache the corpus-wide gram projection (the expensive
        # per-token hash chain) is computed twice.  MEMORY_AND_DISK so
        # a positions table bigger than executor storage spills instead
        # of evicting; released via release_cached().
        from pyspark import StorageLevel

        occ = occ.persist(StorageLevel.MEMORY_AND_DISK)
        _CACHED.append(occ)

    if keep == "none":
        dup_grams = (
            occ.groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") >= min_count)
            .select("__gram")
        )
        dup_pos = occ.join(dup_grams, "__gram").select("__doc", "__pos")
    else:
        firsts = (
            occ.groupBy("__gram")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.min(F.struct("__doc", "__pos")).alias("__first"),
            )
            .filter(F.col("__cnt") >= min_count)
            .select("__gram", "__first")
        )
        dup_pos = (
            occ.join(firsts, "__gram")
            .filter(F.struct("__doc", "__pos") != F.col("__first"))
            .select("__doc", "__pos")
        )

    per_doc = dup_pos.groupBy("__doc").agg(
        F.sort_array(F.collect_list("__pos")).alias("__ps")
    )
    spans = _merge_positions_to_spans(F.col("__ps"), n)
    n_dup = F.aggregate(
        F.col("spans"),
        F.lit(0),
        lambda a, s: a + (s["end"] - s["start"]),
    )

    words = F.split(normalize_text(text), " ")
    n_words = F.when(
        text.isNull() | (F.length(normalize_text(text)) == 0), F.lit(0)
    ).otherwise(F.size(words))
    lens = base.select(
        F.col(doc_id).alias("__doc"), n_words.alias("n_words")
    )

    return (
        per_doc.withColumn("spans", spans)
        .join(lens, "__doc", "left")
        .select(
            F.col("__doc").alias(doc_id),
            "n_words",
            "spans",
            n_dup.alias("n_dup_words"),
            F.when(F.col("n_words") > 0, n_dup / F.col("n_words"))
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    doc_id: str = "doc_id",
    text_column: str = "text",
    n: int = 50,
    min_count: int = 2,
    keep: str = "none",
    cache_positions: bool = False,
) -> DataFrame:
    """Cut every duplicated span out of ``text_column`` (ExactSubstr
    removal).  Documents without duplicated spans pass through with
    their ORIGINAL text; edited documents are rebuilt from normalized
    tokens (lowercase, collapsed whitespace — the same canonical form
    the span positions were computed on, exactly as the suffix-array
    tool edits its tokenized copy).  A document whose every word is
    duplicated becomes the empty string.

    The edit is one broadcast-or-shuffle join (span rows only) + one
    JVM projection: the covered-position set is flattened from the
    merged spans (disjoint by construction) and each token index is
    membership-tested — per-document cost O(words × spans), bounded by
    document length."""
    spans_df = repeated_spans(
        df,
        doc_id=doc_id,
        text_column=text_column,
        n=n,
        min_count=min_count,
        keep=keep,
        cache_positions=cache_positions,
    ).select(F.col(doc_id), F.col("spans").alias("__spans"))

    covered = F.flatten(
        F.transform(
            F.col("__spans"),
            lambda s: F.sequence(s["start"], s["end"] - 1),
        )
    )
    words = F.split(normalize_text(F.col(text_column)), " ")
    kept = F.filter(
        words, lambda w, i: ~F.array_contains(covered, i + 1)
    )
    cleaned = F.concat_ws(" ", kept)
    return (
        df.join(spans_df, doc_id, "left")
        .withColumn(
            text_column,
            F.when(F.col("__spans").isNull(), F.col(text_column)).otherwise(
                cleaned
            ),
        )
        .drop("__spans")
    )
