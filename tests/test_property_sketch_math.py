"""Property-based tests for the sketch store's driver-side merge math
(checkpoint/sketches.py) against independent numpy oracles — no Spark.

Pinned properties:
* the Chan pairwise moment combine, folded over ANY chunking of ANY
  float multiset, reproduces numpy's count/sum/mean/var_pop/min/max;
* histogram vector-addition over any chunking equals the direct bin
  count, and every value lands in exactly one bucket (closed last bin);
* merged_quantiles stays within the containing bin's width of numpy's
  true quantile whenever the data lies inside the edge range, and
  clamps to the boundary edges when mass falls outside.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from great_expectations_spark.checkpoint.sketches import _merge_moments

SETTINGS = dict(max_examples=60, deadline=None)

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _moments_of(chunk):
    arr = np.asarray(chunk, dtype=float)
    return {
        "count": int(arr.size),
        "mean": float(arr.mean()) if arr.size else 0.0,
        "m2": float(((arr - arr.mean()) ** 2).sum()) if arr.size else 0.0,
        "min": float(arr.min()) if arr.size else None,
        "max": float(arr.max()) if arr.size else None,
        "sum": float(arr.sum()),
    }


@given(
    data=st.lists(floats, min_size=1, max_size=200),
    seed=st.integers(0, 2**32 - 1),
)
@settings(**SETTINGS)
def test_chan_combine_matches_numpy_for_any_chunking(data, seed):
    rng = np.random.default_rng(seed)
    arr = np.asarray(data, dtype=float)
    # random chunking incl. possible empty chunks
    n_chunks = int(rng.integers(1, 8))
    bounds = sorted(rng.integers(0, len(data) + 1, size=n_chunks - 1))
    chunks = np.split(arr, bounds)
    acc = None
    for ch in chunks:
        m = _moments_of(ch.tolist())
        if m["count"]:
            acc = _merge_moments(acc, m)
    assert acc is not None
    assert acc["count"] == arr.size
    assert math.isclose(acc["sum"], float(arr.sum()), rel_tol=1e-9, abs_tol=1e-6)
    assert math.isclose(acc["mean"], float(arr.mean()), rel_tol=1e-9, abs_tol=1e-9)
    # var_pop via the merged M2
    assert math.isclose(
        acc["m2"] / acc["count"], float(arr.var()), rel_tol=1e-7, abs_tol=1e-7
    )
    assert acc["min"] == float(arr.min())
    assert acc["max"] == float(arr.max())


def _bin_counts(arr, edges):
    below = int((arr < edges[0]).sum())
    above = int((arr > edges[-1]).sum())
    counts = []
    for i in range(len(edges) - 1):
        if i == len(edges) - 2:
            counts.append(
                int(((arr >= edges[i]) & (arr <= edges[i + 1])).sum())
            )
        else:
            counts.append(
                int(((arr >= edges[i]) & (arr < edges[i + 1])).sum())
            )
    return below, counts, above


@given(
    data=st.lists(floats, min_size=1, max_size=300),
    raw_edges=st.lists(floats, min_size=2, max_size=10, unique=True),
    seed=st.integers(0, 2**32 - 1),
)
@settings(**SETTINGS)
def test_histogram_partition_of_unity_and_chunk_additivity(
    data, raw_edges, seed
):
    edges = sorted(raw_edges)
    arr = np.asarray(data, dtype=float)
    below, counts, above = _bin_counts(arr, edges)
    # every value in exactly one bucket
    assert below + sum(counts) + above == arr.size
    # additivity across any chunking (what merged_histogram relies on)
    rng = np.random.default_rng(seed)
    bounds = sorted(rng.integers(0, len(data) + 1, size=3))
    total = np.zeros(len(counts) + 2, dtype=int)
    for ch in np.split(arr, bounds):
        b, c, a = _bin_counts(ch, edges)
        total += np.array([b] + c + [a])
    assert total.tolist() == [below] + counts + [above]


@given(
    data=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=5,
        max_size=300,
    ),
    q=st.floats(min_value=0.0, max_value=1.0),
)
@settings(**SETTINGS)
def test_quantile_estimate_within_bin_width(tmp_path_factory, data, q):
    from great_expectations_spark.checkpoint.sketches import (
        PartitionSketchStore,
    )

    edges = [0.0, 10.0, 25.0, 50.0, 75.0, 100.0]
    store = PartitionSketchStore(
        str(tmp_path_factory.mktemp("qs")), histogram_edges={"x": edges}
    )
    arr = np.asarray(data, dtype=float)
    below, counts, above = _bin_counts(arr, edges)
    store._record(
        "p",
        {
            "histogram": {
                "x": {
                    "edges": edges, "counts": counts,
                    "below": below, "above": above,
                }
            }
        },
    )
    est = store.merged_quantiles(["x"], [q])["x"][0]
    true = float(np.quantile(arr, q))
    # find the bin containing the true quantile; the estimate must be
    # within that bin's width (in-range data, so no clamping slack)
    width = max(
        edges[i + 1] - edges[i]
        for i in range(len(edges) - 1)
        if edges[i] <= true <= edges[i + 1]
    )
    assert est is not None
    assert abs(est - true) <= width + 1e-9
