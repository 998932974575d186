"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode support tiers:

1. **netpbm (PPM P6 / PGM P5) — REAL decode, no external libs**: parsed
   with stdlib + numpy (`decode_image`), with real nearest-neighbor /
   block-mean resize and a real 16-dim feature vector (4×4 grayscale
   block means).  `encode_ppm` produces valid PPM bytes for tests and
   synthetic corpora.
2. **PIL formats (JPEG/PNG/...)**: used when PIL is importable (absent
   from this container — gated behind an import-try).
3. Anything else raises ``NotImplementedError`` at the decode site,
   unless ``deterministic_fake=True``, which yields a seeded,
   content-derived payload for pure plumbing tests.

Audio tier (same philosophy): **WAV / RIFF 16-bit PCM — REAL decode, no
external libs** via stdlib ``wave`` (`decode_audio`), real spectral
features (RMS, zero-crossing rate, spectral centroid, 8 log-spaced FFT
band energies) with numpy's rfft (`audio_feature_vec`), and
`encode_wav` for synthetic corpora.  Compressed formats (mp3/ogg/...)
raise ``NotImplementedError`` unless ``deterministic_fake=True``.

Schema convention:
  media struct<data: binary, mime: string, width: int, height: int,
               duration_ms: int>
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURE_DIM = 16


def attach_media_metadata(
    df: DataFrame, binary_column: str, mime: str
) -> DataFrame:
    """Wrap a raw binary column with typed metadata (sizes unknown until
    decode; populated by the decode pass)."""
    return df.withColumn(
        f"{binary_column}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )


def encode_ppm(arr) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6) — valid netpbm
    bytes for tests / synthetic corpora."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    header = f"P6\n{a.shape[1]} {a.shape[0]}\n255\n".encode("ascii")
    return header + a.tobytes()


def _parse_netpbm(data: bytes):
    """Parse binary PGM (P5, grayscale) / PPM (P6, RGB) into an
    (H, W, C) uint8 numpy array.  Pure stdlib + numpy — a real decoder
    with no external dependency.  Returns None for other formats."""
    import numpy as np

    if len(data) < 2 or data[:1] != b"P" or data[1:2] not in (b"5", b"6"):
        return None
    channels = 3 if data[1:2] == b"6" else 1
    # header tokens: magic, width, height, maxval — whitespace separated,
    # '#' comments to end-of-line allowed anywhere in the header
    tokens: List[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            pos = data.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        raise ValueError("truncated netpbm header")
    width, height, maxval = (int(t) for t in tokens)
    pos += 1  # single whitespace byte after maxval
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    need = width * height * channels
    body = data[pos : pos + need]
    if len(body) < need:
        raise ValueError("truncated netpbm body")
    return np.frombuffer(body, dtype=np.uint8).reshape(
        height, width, channels
    )


def decode_image(data: bytes):
    """Decode image bytes to an (H, W, C) uint8 array.  netpbm decodes
    natively; other formats require PIL (import-gated — absent from this
    container)."""
    img = _parse_netpbm(data)
    if img is not None:
        return img
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "non-netpbm image decode requires PIL, not available in this "
            "environment; use PPM/PGM bytes or deterministic_fake=True"
        ) from exc
    import numpy as np

    arr = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    return arr


def resize_block_mean(img, out_h: int, out_w: int):
    """Real resize: mean over rectangular source blocks (area
    interpolation) — numpy only, deterministic."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w, img.shape[2]), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            block = img[ys[i] : max(ys[i + 1], ys[i] + 1),
                        xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean(axis=(0, 1))
    return out


def image_feature_vec(img) -> List[float]:
    """16-dim feature: 4×4 grayscale block means, normalized to [0, 1]."""
    import numpy as np

    gray = np.asarray(img, dtype=np.float64).mean(axis=2, keepdims=True)
    grid = resize_block_mean(gray, 4, 4)[:, :, 0]
    return list((grid / 255.0).ravel())


def _decode_image_bytes(data: bytes, deterministic_fake: bool) -> List[float]:
    if deterministic_fake:
        import hashlib

        import numpy as np

        digest = hashlib.blake2b(
            data or b"", digest_size=IMAGE_FEATURE_DIM * 2
        ).digest()
        arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
        return list(arr / 65535.0)
    return image_feature_vec(decode_image(data))


def image_features(
    df: DataFrame,
    binary_column: str = "data",
    deterministic_fake: bool = True,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Per-image feature extraction over ``mapInPandas`` — Arrow batches
    in, Arrow batches out, partition-preserving (no shuffle). The fake
    decode is seeded by content so results are deterministic at any
    parallelism."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.IntegerType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf[binary_column].map(
                lambda b: _decode_image_bytes(
                    bytes(b) if b is not None else b"", deterministic_fake
                )
            )
            pdf["n_bytes"] = pdf[binary_column].map(
                lambda b: len(b) if b is not None else 0
            )
            yield pdf

    return df.mapInPandas(decode_batches, out_schema)


def image_phash_value(img) -> int:
    """64-bit block-mean perceptual hash of a decoded (H, W, C) image:
    grayscale -> 8x8 area-interpolated block means (the real
    :func:`resize_block_mean`, numpy-only) -> each cell compared against
    the MEDIAN of the 64 means (median, not mean: exactly half the bits
    set regardless of global brightness, so the Hamming metric never
    saturates on dark/bright images) -> bits packed row-major into a
    signed int64.  Robust to resizing and mild noise; brightness/contrast
    shifts preserve the median ordering, so the hash is invariant to
    them too."""
    import numpy as np

    gray = np.asarray(img, dtype=np.float64).mean(axis=2, keepdims=True)
    grid = resize_block_mean(gray, 8, 8)[:, :, 0].ravel()
    med = float(np.median(grid))
    acc = 0
    for k in range(64):
        if grid[k] > med:
            acc |= 1 << k
    if acc >= 1 << 63:  # wrap to signed int64 (Spark LongType)
        acc -= 1 << 64
    return acc


def _phash_bytes(data: bytes, deterministic_fake: bool) -> Optional[int]:
    if data is None:
        return None
    if deterministic_fake:
        import hashlib

        digest = hashlib.blake2b(data or b"", digest_size=8).digest()
        return int.from_bytes(digest, "little", signed=True)
    return image_phash_value(decode_image(bytes(data)))


def image_phash(
    df: DataFrame,
    binary_column: str = "data",
    deterministic_fake: bool = True,
    output_column: str = "phash",
) -> DataFrame:
    """Append a 64-bit perceptual hash column — the same Arrow
    ``mapInPandas`` pass as :func:`image_features` (partition-
    preserving, no shuffle), so featurization and hashing can share one
    decode when composed.  NULL bytes hash to NULL (skipped by the
    dedup join)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(output_column, T.LongType())]
    )

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[output_column] = pdf[binary_column].map(
                lambda b: _phash_bytes(b, deterministic_fake)
            )
            yield pdf

    return df.mapInPandas(hash_batches, out_schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_column: str,
    binary_column: str = "data",
    max_hamming: int = 3,
    deterministic_fake: bool = True,
    n_blocks: Optional[int] = None,
    expected_corpus_size: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate image pairs: perceptual hash per image (one Arrow
    decode pass), then the SAME sub-quadratic block-combination banding
    the text SimHash path uses (``dedup.hamming_band_pairs`` — bucket
    keys per block combination, candidate self-join within buckets,
    exact Hamming verify).  Returns ``(id_a, id_b, hamming)`` for every
    pair within ``max_hamming`` bits; never all-pairs, so it scales to
    web-crawl image corpora the way the text dedup family does."""
    from great_expectations_spark.functions.dedup import (
        hamming_band_pairs,
    )

    hashed = image_phash(
        df.select(id_column, binary_column),
        binary_column,
        deterministic_fake=deterministic_fake,
        output_column="__phash",
    )
    return hamming_band_pairs(
        hashed,
        id_column,
        "__phash",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        expected_corpus_size=expected_corpus_size,
    )


AUDIO_FEATURE_DIM = 12  # duration_s, rms, zcr, centroid + 8 band energies
_AUDIO_N_BANDS = 8


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 (or float in [-1, 1]) array as mono 16-bit PCM
    WAV bytes — valid RIFF for tests / synthetic corpora.  Stdlib only."""
    import io
    import wave

    import numpy as np

    a = np.asarray(samples)
    if a.dtype.kind == "f":
        a = np.clip(a, -1.0, 1.0)
        a = (a * 32767.0).round().astype(np.int16)
    else:
        a = a.astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(a.tobytes())
    return buf.getvalue()


def decode_audio(data: bytes):
    """Decode WAV (RIFF 16-bit PCM) bytes to ``(samples, sample_rate)``
    with ``samples`` a 1-D float64 array in [-1, 1] (channels averaged
    to mono).  Pure stdlib + numpy — a real decoder.  Compressed
    formats would need an external codec and raise."""
    import io
    import wave

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "non-WAV audio decode requires an external codec, not "
            "available in this environment; use PCM WAV bytes or "
            "deterministic_fake=True"
        )
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        frames = w.readframes(w.getnframes())
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {width*8}-bit")
    a = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        a = a[: (len(a) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return a, rate


def audio_feature_vec(samples, sample_rate: int) -> List[float]:
    """12-dim deterministic feature vector from a mono waveform:
    ``[duration_s, rms, zero_crossing_rate, spectral_centroid_norm,
    band_energy_0..7]`` — centroid normalized by Nyquist, band energies
    the L1-normalized magnitude mass in 8 log-spaced rfft bands.  Closed
    forms for pure tones make every slot unit-testable: a sine of
    amplitude A has rms A/sqrt(2), zcr 2f/sr, centroid f/(sr/2), and all
    its band mass in the band containing f."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    sr = float(sample_rate)
    n = a.size
    if n == 0 or sr <= 0:
        return [0.0] * AUDIO_FEATURE_DIM
    duration = n / sr
    rms = float(np.sqrt(np.mean(a * a)))
    signs = np.signbit(a)
    # zcr as crossings per sample (dimensionless, = 2f/sr for a tone)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / n
    mag = np.abs(np.fft.rfft(a))
    mag[0] = 0.0  # DC carries no pitch information
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    total = mag.sum()
    nyquist = sr / 2.0
    centroid = float((freqs * mag).sum() / total / nyquist) if total > 0 else 0.0
    # 8 log-spaced bands from ~31 Hz (or the first bin) to Nyquist
    lo = max(freqs[1] if n > 1 else 1.0, 31.25)
    edges = np.geomspace(lo, nyquist, _AUDIO_N_BANDS + 1)
    edges[0], edges[-1] = 0.0, nyquist + 1.0
    bands = [
        float(mag[(freqs >= edges[i]) & (freqs < edges[i + 1])].sum() / total)
        if total > 0
        else 0.0
        for i in range(_AUDIO_N_BANDS)
    ]
    return [duration, rms, zcr, centroid] + bands


def _decode_audio_bytes(data: bytes, deterministic_fake: bool):
    """Returns (feature list, duration_ms) — fake features are content
    seeded so plumbing tests are deterministic at any parallelism."""
    if deterministic_fake:
        import hashlib

        import numpy as np

        digest = hashlib.blake2b(
            data or b"", digest_size=AUDIO_FEATURE_DIM * 2
        ).digest()
        arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float64)
        return list(arr / 65535.0), 0
    samples, rate = decode_audio(data)
    vec = audio_feature_vec(samples, rate)
    return vec, int(round(vec[0] * 1000.0))


def audio_features(
    df: DataFrame,
    binary_column: str = "data",
    deterministic_fake: bool = False,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Per-clip audio feature extraction over ``mapInPandas`` — Arrow
    batches in/out, partition-preserving (no shuffle).  Appends
    ``features: array<double>`` (AUDIO_FEATURE_DIM), ``duration_ms``,
    and ``n_bytes``.  Null/empty payloads yield null features rather
    than failing the batch."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("n_bytes", T.IntegerType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            feats, durs, sizes = [], [], []
            for b in pdf[binary_column]:
                if b is None or len(b) == 0:
                    feats.append(None)
                    durs.append(None)
                    sizes.append(0)
                    continue
                vec, dur = _decode_audio_bytes(bytes(b), deterministic_fake)
                feats.append(vec)
                durs.append(dur)
                sizes.append(len(b))
            pdf["features"] = feats
            pdf["duration_ms"] = durs
            pdf["n_bytes"] = sizes
            yield pdf

    return df.mapInPandas(decode_batches, out_schema)


def frame_sample_plan(
    df: DataFrame,
    duration_column: str,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: explode each row into frame
    timestamps (JVM-side sequence/explode); the actual frame decode joins
    on (row, frame_ts) in the real pipeline."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_column) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
