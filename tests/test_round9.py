"""Round-9 additions: scale-safe B19 ranks, persisted-ANN serving twins,
multi-batch CDC MERGE chain, streaming crash-recovery (in test_streaming)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from affinity_propagation_mapreduce_spark.operators.relational import (
    _t,
    q_win_ntile_pctrank,
)

from .conftest import SF_T2

SF_01 = "/root/testdata/sf0.1"


def test_ntile_pctrank_matches_global_window(spark):
    """The range-partition + offset formulation must be VALUE-identical
    to the textbook global window at a larger sf than parity checks
    (different range boundaries, more ties)."""
    cust = _t(spark, SF_01, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    ref = cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    got = q_win_ntile_pctrank(spark, SF_01)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_ntile_pctrank_no_single_partition_sort(spark):
    """The scale claim: no stage funnels the whole table through one
    task — the plan must not contain a SinglePartition exchange."""
    plan = (
        q_win_ntile_pctrank(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    # no Window at all: ranks are closed forms of the id-encoded
    # (pid, local row number) + broadcast offsets
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
