"""Skew mitigation: salted aggregation and salted broadcast-replicate join.

First-line defense at 100 TB is AQE (`spark.sql.adaptive.skewJoin.enabled`,
pinned on in session.py): it splits oversized *shuffle* partitions at
runtime.  Salting covers the two shapes AQE cannot re-plan:

* a single hot GROUP BY key whose partial aggregate still funnels into one
  reducer — `salted_aggregate` splits the key into S sub-keys and
  re-combines (two map-side-combinable stages, no single hot reducer);
* a shuffle join where one side's hot key dwarfs a partition —
  `salted_join` replicates the (small-ish) right side S× and spreads the
  left side's hot rows across the S replicas.

Both are deterministic: the salt is `pmod(hash(entire-row-key...), S)` on
data columns, never `rand()`, so retried tasks recompute identical output
(a requirement for exactly-once sinks and for this repo's hash-parity
gate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(cols: Sequence[str | Column], n: int) -> Column:
    return F.pmod(F.hash(*[F.col(c) if isinstance(c, str) else c for c in cols]), F.lit(n))


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_by: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name -> one of 'sum'/'count'/'min'/'max'
    over an input column (``{"revenue": "sum:amount", "n": "count:*"}``).
    Stage 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 re-combines per key.  Only algebraic
    aggregates are offered: they re-combine losslessly.

    ``salt_by`` names the columns whose hash spreads the hot key's rows
    (pick high-cardinality columns NOT in the group key).
    """
    first: list[Column] = []
    second: list[Column] = []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        tmp = f"__{out}"
        if op == "sum":
            first.append(F.sum(col).alias(tmp))
            second.append(F.sum(tmp).alias(out))
        elif op == "count":
            first.append(F.count("*" if col in ("", "*") else col).alias(tmp))
            second.append(F.sum(tmp).cast("long").alias(out))
        elif op == "min":
            first.append(F.min(col).alias(tmp))
            second.append(F.min(tmp).alias(out))
        elif op == "max":
            first.append(F.max(col).alias(tmp))
            second.append(F.max(tmp).alias(out))
        else:
            raise ValueError(f"non-algebraic agg {spec!r} cannot be salted")
    salted = df.withColumn("__salt", _salt_col(salt_by, n_salts))
    partial = salted.groupBy(key, "__salt").agg(*first)
    return partial.groupBy(key).agg(*second)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_by: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``right`` across ``n_salts`` salt
    values (explode — right grows S×, so keep S modest and the right side
    the smaller relation) and spread ``left`` by hashing ``salt_by``.
    Each (key, salt) pair now holds ~1/S of the hot key's rows.

    Output columns = left columns + right's non-key columns (coalesced
    names must not collide; callers project beforehand).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salted = left.withColumn("__salt", _salt_col(salt_by, n_salts))
    r_rep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_rep, [key, "__salt"], how)
    return out.drop("__salt")
