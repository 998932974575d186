"""Byte-pair-encoding tokenizer: driver-trained merges, Arrow-batched
distributed encode/decode.

Completes the training-data pipeline between curation and packing:
``materialize_blocks`` (functions/packing.py) slices documents into
fixed-size token blocks by COUNT; this module produces the token IDS a
writer job actually emits.  The algorithm is the classic BPE of
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", public paper) over the byte alphabet, i.e. the
GPT-2-family scheme minus the regex pre-split (we reuse
``text.BPE_TOKEN`` for word pre-splitting so merges never cross word
boundaries).

Scale design:

* **Training is driver-side over a BOUNDED corpus-sample word
  histogram** — the distributed part is one ``groupBy(word)`` count
  (map-side combined, hot words collapse before the shuffle) capped to
  the top ``train_words`` by count: merge quality needs frequent words,
  not the tail.  The merge loop itself is the textbook O(vocab ·
  unique-words) scan — kilobytes of state, deterministic (ties broken
  by pair order), no Spark jobs inside the loop.
* **Encoding is an Arrow-batched pandas UDF** (tokenization is
  inherently per-string iterative — the one family where the engine
  policy allows Python, same as SimHash signatures).  Each batch
  applies merges with a rank dict; cost is O(tokens · merges-applied)
  per batch, embarrassingly parallel across partitions.
* The trained tokenizer is a plain dict (vocab + ranked merges) —
  kilobytes, shipped to executors by closure like the IVF-PQ
  codebooks; ``save/load`` use JSON through Spark's Hadoop FS so
  ``file://``/``s3a://``/``gs://`` all work.

No reference-repo analog (Great Expectations validates, it does not
tokenize); closest public references are Sennrich et al.'s released
``learn_bpe.py``/``apply_bpe.py`` (algorithm followed, code not
copied) and the GPT-2 byte-level scheme.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.functions.text import BPE_TOKEN

# id layout: 0..255 raw bytes, then merges in rank order
_BYTE_VOCAB = 256


def _word_histogram(
    df: DataFrame, text_column: str, train_words: int
) -> List[Tuple[str, int]]:
    """Top-``train_words`` (word, count) pairs corpus-wide: one
    map-side-combined groupBy + a TakeOrdered-style bounded collect
    (orderBy+limit never materializes a full sort)."""
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_column)), F.lit(BPE_TOKEN), F.lit(0)
        )
    ).alias("__w")
    rows = (
        df.filter(F.col(text_column).isNotNull())
        .select(words)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w"))
        .limit(train_words)
        .collect()
    )
    return [(r["__w"], r["__c"]) for r in rows]


def train_bpe(
    df: DataFrame,
    text_column: str = "text",
    vocab_size: int = 1024,
    train_words: int = 50_000,
) -> Dict[str, object]:
    """Learn ``vocab_size - 256`` byte-pair merges from the corpus.

    Returns ``{"merges": [[a, b], ...], "vocab_size": n}`` where each
    merge pairs two existing token ids (bytes 0-255 are ids 0-255, the
    i-th merge creates id 256+i).  Deterministic: the histogram is
    count-then-word ordered and ties in pair frequency break on the
    smaller (a, b)."""
    if vocab_size <= _BYTE_VOCAB:
        raise ValueError(f"vocab_size must be > 256, got {vocab_size}")
    hist = _word_histogram(df, text_column, train_words)
    # words as byte-id sequences
    seqs: List[Tuple[List[int], int]] = [
        (list(w.encode("utf-8")), c) for w, c in hist
    ]
    merges: List[Tuple[int, int]] = []
    for new_id in range(_BYTE_VOCAB, vocab_size):
        counts: Dict[Tuple[int, int], int] = {}
        for seq, c in seqs:
            for i in range(len(seq) - 1):
                pair = (seq[i], seq[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        next_seqs = []
        for seq, c in seqs:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            next_seqs.append((out, c))
        seqs = next_seqs
    return {
        "merges": [[a, b] for a, b in merges],
        "vocab_size": _BYTE_VOCAB + len(merges),
    }


def _encode_word(word_bytes: List[int], ranks: Dict[Tuple[int, int], int],
                 first_new_id: int = _BYTE_VOCAB) -> List[int]:
    """Apply merges to one word by ascending rank (the apply_bpe loop)."""
    seq = word_bytes
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq = (
            seq[:best_i]
            + [first_new_id + best_rank]
            + seq[best_i + 2 :]
        )
    return seq


def bpe_encode(col: Column, tokenizer: Dict[str, object]) -> Column:
    """Token ids (``array<int>``) for ``col`` under a trained tokenizer.

    Arrow-batched pandas UDF: the ranked-merge dict is closed over
    (kilobytes per executor); each batch lowercases, pre-splits with
    the same ``BPE_TOKEN`` regex used in training, and BPE-encodes each
    word.  NULL text encodes to NULL (a missing document has no
    tokens, matching ``token_count``)."""
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {
        (a, b): i for i, (a, b) in enumerate(tokenizer["merges"])
    }
    tok_re = re.compile(BPE_TOKEN)

    @pandas_udf("array<int>")
    def _enc(texts):
        import pandas as pd

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ids: List[int] = []
            for w in tok_re.findall(t.lower()):
                ids.extend(_encode_word(list(w.encode("utf-8")), ranks))
            out.append(ids)
        return pd.Series(out)

    return _enc(col)


def bpe_decode_py(ids: List[int], tokenizer: Dict[str, object]) -> str:
    """Driver-side decode (round-trip checks / debugging): expand merge
    ids back to bytes, UTF-8 decode.  Word boundaries are not stored —
    BPE over pre-split words is lossy about inter-word whitespace, so
    the round-trip contract is concatenated lowercased words."""
    table: List[List[int]] = [[i] for i in range(_BYTE_VOCAB)]
    for a, b in tokenizer["merges"]:
        table.append(table[a] + table[b])
    out: List[int] = []
    for i in ids:
        out.extend(table[i])
    return bytes(out).decode("utf-8", errors="replace")


def bpe_save(spark, tokenizer: Dict[str, object], path: str) -> None:
    """Persist through Spark's Hadoop FileSystem (any scheme the
    session reaches)."""
    from great_expectations_spark.functions._hadoop_io import (
        hadoop_json_save,
    )

    hadoop_json_save(spark, tokenizer, path)


def bpe_load(spark, path: str) -> Dict[str, object]:
    from great_expectations_spark.functions._hadoop_io import (
        hadoop_json_load,
    )

    t = hadoop_json_load(spark, path)
    t["merges"] = [tuple(m) for m in t["merges"]]
    return t
