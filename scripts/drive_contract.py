#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally.

Runs ``entry(spark)`` as a smoke check, then for every name in
``queries()`` runs the Spark callable and (when present) the
``oracle_sql()[name]`` string under DuckDB over the same parquet
tables, normalizes both sides (sort columns by name, round floats to
4 decimals, sort rows) and compares row counts + value hashes —
the same contract the driver records in CORRECTNESS_r{N}.json.

Usage: python scripts/drive_contract.py [sf_dir] [only_query ...]
"""
import hashlib
import json
import os
import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    """Canonicalize one value: Decimal/float -> round 4dp, integral
    floats -> int (DuckDB hands back Decimal where Spark has double or
    long; within a gate the SEMANTIC type matches, so collapsing
    numeric spellings is safe — int64 ids never pass through float)."""
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        v = round(v, 4)
        if v == -0.0:
            v = 0.0
        if v == int(v) and abs(v) < 2**53:
            v = int(v)
    if isinstance(v, (list, tuple)):
        v = tuple(canon(x) for x in v)
    return v


def normalize(rows, cols):
    """Sort columns by name, canonicalize values, sort rows; return
    (row_count, sha256-of-values)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    h = hashlib.sha256()
    for r in out:
        h.update(repr(r).encode())
    return len(out), h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    if not ONLY:
        t0 = time.time()
        df = entrymod.entry(spark)
        n = df.count()
        print(f"entry: {n} rows, schema={df.schema.simpleString()} "
              f"({time.time() - t0:.1f}s)", flush=True)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_match = n_mismatch = n_rowsonly = 0
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}",
                  flush=True)
            n_mismatch += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)", flush=True)
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}",
                  flush=True)
            n_mismatch += 1
            failures.append(name)
            continue
        sn, sh = normalize(srows, scols)
        on, oh = normalize(orows, ocols)
        ok = sn == on and sh == oh and sorted(scols) == sorted(ocols)
        if ok:
            n_match += 1
            print(f"MATCH {name}: {sn} rows ({time.time() - t0:.1f}s)",
                  flush=True)
        else:
            n_mismatch += 1
            failures.append(name)
            print(f"FAIL  {name}: spark({sn},{sh[:12]}) cols={sorted(scols)}"
                  f" vs oracle({on},{oh[:12]}) cols={sorted(ocols)}",
                  flush=True)
    print(json.dumps({
        "match": n_match, "mismatch": n_mismatch, "rows_only": n_rowsonly,
        "failures": failures,
    }), flush=True)
    if n_mismatch == 0:
        print("ALL MATCH", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
