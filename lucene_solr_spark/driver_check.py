"""Local mimic of the driver's correctness gate: run each queries()[name]
via Spark AND its oracle_sql()[name] via DuckDB on the same parquet tables,
compare row-count + schema (column names) + order-insensitive values.

Usage: python -m lucene_solr_spark.driver_check [--sf-dir /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import math
import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    try:  # Decimal -> float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def compare_one(spark, con, name: str, fn, sql: str | None, sf_dir: str):
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        return {"name": name, "status": "rows_only", "rows": len(srows)}
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"schema: spark={scols} duckdb={dcols}")
    if len(srows) != len(drows):
        problems.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
    if not problems:
        a, b = _normalize(srows, scols), _normalize(drows, dcols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ, first diffs: {diff}")
    return {
        "name": name,
        "status": "ok" if not problems else "MISMATCH",
        "rows": len(srows),
        "problems": problems,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    con = _duck(args.sf_dir)
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare_one(spark, con, name, fn, oracles.get(name), args.sf_dir)
        except Exception as e:
            r = {"name": name, "status": "ERROR", "problems": [str(e)[:400]]}
        flag = "✓" if r["status"] in ("ok", "rows_only") else "✗"
        print(f"{flag} {name:28s} {r['status']:9s} rows={r.get('rows','-')}")
        for p in r.get("problems", []):
            print(f"    {p}")
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
