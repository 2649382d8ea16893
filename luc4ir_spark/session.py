"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "luc4ir_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Local-mode defaults: shuffle partitions ~ cores (not the 200 default),
    AQE on (runtime coalesce + skew-join split), Arrow on (all custom
    kernels are pandas UDFs), UTC (oracle comparability).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep bucketed scans on even when no operator needs the
        # distribution: bucket PRUNING (a dictionary filter over a
        # term-bucketed positional store reading k of N buckets)
        # rides the bucketed scan, and the DisableUnnecessaryBucketedScan
        # rule would silently drop it for filter-only plans
        .config(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false",
        )
        .config("spark.ui.enabled", "false")
        # 8g execution memory measurably spills/anti-scales at 32 threads
        # (BENCH/BASELINE.md); the sandbox has 128 GiB — default high,
        # override with SPARK_DRIVER_MEM when sharing the box
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", "48g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
