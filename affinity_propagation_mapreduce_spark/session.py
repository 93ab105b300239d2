"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we would ship to a 1000-executor cluster (AQE on, skew-join handling on,
partition coalescing on).  Nothing here is local-mode-specific except the
master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs we consider part of the engine, not the environment.  AQE gives
# runtime shuffle coalescing + skew-join splitting, which is the 100 TB
# answer to skewed groupBy/join keys (SURVEY.md §4.2).
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep vectorized reader + pushdown on (defaults, pinned)
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
}


def get_spark(app_name: str = "affinity-propagation-mapreduce-spark") -> SparkSession:
    """Return the active session or build a local one with engine confs."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # quantizer-training samples are legitimately driver-sized
        # O(nlist·d) data — ~440 MB at 10M×768 — and the sampling
        # limit's per-task partials ride the same cap; 1g default trips
        # at wide d while the driver heap has plenty of room
        .config("spark.driver.maxResultSize", "4g")
        # long sessions generate many codegen classes (iterative AP most
        # of all); the default 240m JIT code cache fills and the compiler
        # silently shuts off, making every later query 3-5x slower
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    for key, val in ENGINE_CONFS.items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
