"""Central query/oracle registry — the single source for
__spark_entry__.py, tests, and bench.py.

Each operator module contributes QUERIES / ORACLES dicts; names are the
SURVEY.md §2 operator ids.  A name present in QUERIES but absent from
ORACLES is a declared rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Ordered CHEAPEST FIRST: the driver's correctness gate walks queries()
# in insertion order under a global budget, so if it runs out of time the
# truncation hits the most expensive family, not dozens of sub-second
# queries (round 1 ran the uncached AP family first and 27 later queries
# never got a CORRECTNESS row).  The AP family sits last: even with the
# shared kernel/state cache it is the most expensive block, and its
# oracle side runs T-deep windowed CTE stacks in DuckDB.
_OPERATOR_MODULES = [
    "affinity_propagation_mapreduce_spark.operators.relational",
    "affinity_propagation_mapreduce_spark.operators.sampling",
    "affinity_propagation_mapreduce_spark.operators.curation",
    "affinity_propagation_mapreduce_spark.operators.semistructured",
    "affinity_propagation_mapreduce_spark.operators.events",
    "affinity_propagation_mapreduce_spark.operators.udfops",
    "affinity_propagation_mapreduce_spark.operators.multimodal",
    "affinity_propagation_mapreduce_spark.operators.vector",
    "affinity_propagation_mapreduce_spark.operators.textops",
    "affinity_propagation_mapreduce_spark.operators.ap",
]


def _load() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _OPERATOR_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet (incremental rounds)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def oracle_sql() -> dict[str, str]:
    q, o = _load()
    return {name: sql for name, sql in o.items() if name in q}
