"""Driver-style correctness sweep: every ``queries()`` entry vs its
``oracle_sql()`` DuckDB replica at sf0.01.

Replicates the driver's compare (row count, schema names, value hash
over name-sorted columns and sorted rows) so mismatches surface before
CORRECTNESS_r{N} does.  Run:

    python jobs/correctness_sweep.py [--sf /root/testdata/sf0.01] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(pdf) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm(r[c]) for c in cols) for _, r in pdf.iterrows()
    )
    h = hashlib.md5()
    for row in rows:
        h.update("\x1f".join(row).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import duckdb

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = E.queries()
    oracles = E.oracle_sql()
    only = {k for k in args.only.split(",") if k}
    report = {}
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            report[name] = {"err": f"spark: {exc}"}
            bad.append(name)
            print(f"FAIL {name}: spark error {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            report[name] = {
                "rows": len(sdf),
                "rows_only": True,
                "sec": round(time.time() - t0, 2),
            }
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            report[name] = {"err": f"oracle: {exc}"}
            bad.append(name)
            print(f"FAIL {name}: oracle error {exc}")
            continue
        rows_match = len(sdf) == len(odf)
        schema_match = sorted(sdf.columns) == sorted(odf.columns)
        hash_match = (
            rows_match
            and schema_match
            and value_hash(sdf) == value_hash(odf)
        )
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "sec": round(time.time() - t0, 2),
        }
        status = "ok" if hash_match else "MISMATCH"
        if not hash_match:
            bad.append(name)
            print(
                f"{status} {name}: rows {len(sdf)}/{len(odf)} "
                f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            if rows_match and schema_match and len(sdf) <= 10:
                print("  spark:", sdf.to_dict("records"))
                print("  oracle:", odf.to_dict("records"))
        else:
            print(f"{status} {name} ({report[name]['sec']}s)")

    out = "/tmp/correctness_sweep.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    n_ok = sum(1 for v in report.values() if v.get("hash_match"))
    print(f"\n{n_ok}/{len(report)} hash-green; mismatches: {bad or 'none'}")
    print(f"report: {out}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
