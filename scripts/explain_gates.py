#!/usr/bin/env python3
"""Write ``.explain('formatted')`` output for named driver gates.

Usage:
    python scripts/explain_gates.py OUTDIR SUFFIX SF_DIR gate [gate ...]

Writes ``OUTDIR/<gate>_<SUFFIX>.txt`` with the formatted physical plan
of each named ``__spark_entry__.queries()`` callable (the same plan the
driver's query would execute). Session mirrors scripts/drive_contract.py
(plain local[8] builder) so plan shapes match the drive, not the tuned
bench session.
"""
import os
import sys

OUTDIR = sys.argv[1]
SUFFIX = sys.argv[2]
SF_DIR = sys.argv[3]
GATES = sys.argv[4:]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    os.makedirs(OUTDIR, exist_ok=True)
    for name in GATES:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(OUTDIR, f"{name}_{SUFFIX}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
