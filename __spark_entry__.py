"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``affinity_propagation_mapreduce_spark``
(operator modules under operators/, registry in registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from affinity_propagation_mapreduce_spark import registry
from affinity_propagation_mapreduce_spark.operators import ap


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Affinity Propagation clustering (the reference's entire
    reason to exist) on sf0.001 embeddings — T=3 damped iterations,
    median preference, deterministic assignment.  Returns
    (vec_id, exemplar); rows == 500 > 0."""
    return ap.cluster(spark, "/root/testdata/sf0.001", iterations=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    return registry.oracle_sql()
