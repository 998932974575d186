"""Local replica of the driver's DuckDB oracle gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare row-for-row
(order-insensitive, column-name-aligned) with ``oracle_sql()``."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    out = []
    for r in rows:
        vals = []
        for c in columns:
            v = r[c] if not isinstance(r, tuple) else r[columns.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
                v = round(float(v), 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ducks, name):
    sdf = QUERIES[name](spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = _normalize(
        [r.asDict() for r in sdf.collect()], cols
    )
    rel = ducks.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows_raw = rel.fetchall()
    assert sorted(duck_cols) == [c.lower() for c in cols], (
        f"column mismatch: spark={cols} duck={duck_cols}"
    )
    reorder = [duck_cols.index(c.lower()) for c in cols]
    duck_rows = _normalize(
        [tuple(row[i] for i in reorder) for row in duck_rows_raw],
        list(range(len(cols))),
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}\n"
        f"spark={spark_rows[:5]}\nduck={duck_rows[:5]}"
    )
    for srow, drow in zip(spark_rows, duck_rows):
        for sval, dval in zip(srow, drow):
            if isinstance(sval, float) or isinstance(dval, float):
                assert sval == pytest.approx(dval, rel=1e-6, abs=1e-6), (
                    f"{name}: {srow} != {drow}"
                )
            else:
                assert sval == dval, f"{name}: {srow} != {drow}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 7
    assert all(r["unexpected_count"] >= 0 for r in rows)
