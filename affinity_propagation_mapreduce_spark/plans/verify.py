"""Local mirror of the driver's correctness gate.

Runs a declared Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares column RESULT TYPES, row count, column
names, and the full multiset of values (order-insensitive, exact after
canonicalization).

The type check exists because the driver's value hash is type-sensitive
while pandas-level value comparison is not: round 2 shipped seven oracles
whose integer ``sum()`` came back as DuckDB HUGEINT — values identical,
driver hash FAIL.  ``_duck_type_ok`` therefore rejects any oracle column
whose DuckDB type cannot hash-match the Spark column type, with HUGEINT
and DATE banned outright (DATE → pandas midnight-timestamp, another
round-1 divergence class).
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


# The driver hash is KIND-sensitive, not width-sensitive (calibrated
# against CORRECTNESS_r02: BIGINT-vs-int32 row_number columns passed,
# DECIMAL-vs-double passed, HUGEINT-vs-bigint failed — HUGEINT fetches as
# float64 while Spark's integer sum stays int64).  So both sides map to a
# kind: i=integer, f=float, s=string, b=bool, t=timestamp; mismatched
# kinds fail.  HUGEINT additionally fails outright (always an un-cast
# integer aggregate, and lossy beyond 2^53), as does Spark DateType
# (pandas date objects vs DuckDB's datetime64 midnight).
_DUCK_KIND = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i",
    "FLOAT": "f", "DOUBLE": "f",
    "VARCHAR": "s",
    "BOOLEAN": "b",
    "TIMESTAMP": "t", "TIMESTAMP WITH TIME ZONE": "t", "DATE": "t",
}

_SPARK_KIND = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f",
    "string": "s",
    "boolean": "b",
    "timestamp": "t", "timestamp_ntz": "t",
}


def type_mismatches(spark_df, rel) -> list[str]:
    """Compare a Spark DataFrame's schema against a DuckDB relation's
    result types; return human-readable mismatch strings (empty = OK)."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    problems = [
        f"{name}: spark DateType never hashes (pandas date objects) — "
        "emit a date_trunc timestamp instead"
        for name, s_t in spark_types.items()
        if s_t == "date"
    ]
    for col, dtype in zip(rel.columns, rel.types):
        duck_t = str(dtype).upper()
        if duck_t == "HUGEINT":
            problems.append(
                f"{col}: oracle HUGEINT (un-cast integer aggregate?) — "
                "CAST(... AS BIGINT)"
            )
            continue
        if duck_t.startswith("DECIMAL"):
            duck_kind = "f"  # fetches as float64
        else:
            duck_kind = _DUCK_KIND.get(duck_t)
        s_t = spark_types.get(col)
        spark_kind = _SPARK_KIND.get(s_t) if s_t is not None else None
        if duck_kind is None or (s_t is not None and spark_kind is None):
            problems.append(
                f"{col}: unhashable type (oracle {duck_t}, spark {s_t}) — "
                "serialize arrays/maps to strings"
            )
            continue
        if spark_kind is not None and spark_kind != duck_kind:
            problems.append(f"{col}: oracle {duck_t} vs spark {s_t}")
    return problems


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
        rel = con.sql(oracle_sql)
        bad_types = type_mismatches(spark_df, rel)
        duck_pd = rel.fetchdf()
    finally:
        con.close()

    if bad_types:
        return ParityReport(
            name, False, len(spark_pd), len(duck_pd),
            "result-type mismatch: " + "; ".join(bad_types),
        )
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
