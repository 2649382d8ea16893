"""Executor-side packaging.

Any operator that ships Python to executors (pandas UDFs /
``applyInPandas`` kernels) needs the ``luc4ir_spark`` package importable
in the executor Python workers. Under ``spark-submit --py-files
luc4ir_spark.zip`` that's handled by Spark; for interactive / driver-
harness sessions started from an arbitrary cwd it is NOT — so every
executor-touching entry point calls ``ensure_package_on_executors``,
which zips this package once and registers it via ``addPyFile``
(idempotent per SparkContext).

``make_pyfiles_zip`` is also the artifact builder for cluster submission:
    spark-submit --py-files $(python -m luc4ir_spark.deploy) job.py
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[int] = set()


def make_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the luc4ir_spark package -> path (for --py-files / addPyFile)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest = dest or os.path.join(
        tempfile.gettempdir(), f"luc4ir_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return dest


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _ADDED:
        return
    try:
        sc.addPyFile(make_pyfiles_zip())
    except Exception:
        # e.g. file already registered under this name in a reused context
        pass
    _ADDED.add(key)


if __name__ == "__main__":
    print(make_pyfiles_zip())
