"""Parquet table sources (TESTDATA.md / FIXTURES.md schemas).

The reference read point vectors from text files on a local FS / HDFS
(SURVEY.md §1.1); this engine reads columnar parquet so Catalyst gets
predicate pushdown + column pruning for free, and at 100 TB the same reader
handles partitioned layouts and object storage without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. ``sf_dir`` is e.g. /root/testdata/sf0.01."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can see them."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
