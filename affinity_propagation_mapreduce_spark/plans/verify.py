"""Local mirror of the driver's correctness gate.

Runs a declared Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares row count, column names, and the full
multiset of values (order-insensitive, exact after canonicalization).
This is intentionally *stricter* than any sane hash the driver could use:
if this passes, a value hash passes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal
from typing import Any

import duckdb
import pandas as pd

from ..sources import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 / +0.0
        return v
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def _rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return out


@dataclass
class ParityReport:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list = field(default_factory=list)


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> ParityReport:
    spark_pd = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pd = con.sql(oracle_sql).fetchdf()
    finally:
        con.close()

    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return ParityReport(
            name, False, len(spark_pd), len(duck_pd),
            f"column mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}",
        )
    if len(spark_pd) != len(duck_pd):
        return ParityReport(
            name, False, len(spark_pd), len(duck_pd), "row count mismatch"
        )
    s_rows, d_rows = _rows(spark_pd), _rows(duck_pd)
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    return ParityReport(
        name,
        not mism,
        len(spark_pd),
        len(duck_pd),
        "" if not mism else f"{len(mism)} differing rows (of {len(s_rows)})",
        mism[:5],
    )
