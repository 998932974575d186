"""Plan-construction helpers shared by the model-literal scorers.

Measured on this container (pyspark 4.1.2, classic py4j mode), building
a 16,384-element double array Column:

===========================  ============  =====================
construction path            build time    py4j traffic
===========================  ============  =====================
``F.lit([floats])``          ~6.3 s        one call per element
``F.lit(np.ndarray)``        ~2.3 s        one call per element
``F.expr("array(...)")``     ~0.013 s      ONE string
===========================  ============  =====================

All three produce the same JVM expression (a foldable CreateArray the
optimizer collapses to a single array Literal), so execution is
identical — only driver-side construction differs.  Every scorer that
ships a model as data (perplexity LM histograms, quality-classifier
weights, IVF-PQ ADC tables) must build its literals here or pay
seconds of py4j round-trips per query construction.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_lit_f64(values: Iterable[float]) -> Column:
    """array<double> literal Column via ONE py4j transfer.

    ``repr(float)`` round-trips doubles exactly (shortest-repr is
    guaranteed re-parseable to the same bits), so this is lossless.
    NaN/inf are not representable in SQL float literals and raise."""
    parts = []
    for v in values:
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            raise ValueError("array_lit_f64 cannot encode NaN/inf")
        parts.append(repr(f))
    if not parts:
        return F.array().cast("array<double>")
    # the D suffix types every element DOUBLE (no decimal inference)
    return F.expr("array(" + ",".join(p + "D" for p in parts) + ")")
